"""Object-store config plumbing (cloud.py): scheme dispatch, committer
selection, credential wiring, and the reference-parity knobs — exercised by
key (the hadoop-aws/hadoop-azure jars are absent here by design)."""

from __future__ import annotations

import pytest

from bifrost_spark.cloud import abfss_conf, apply_conf, object_store_conf, s3a_conf


def test_s3a_selects_magic_committer_and_uploader_parallelism():
    conf = s3a_conf(max_concurrent_uploads=4)
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    # reference :uploaders-n analog
    assert conf["spark.hadoop.fs.s3a.threads.max"] == "4"
    # no credentials given → provider chain, no key material in conf
    assert not any("access.key" in k or "secret.key" in k for k in conf)


def test_s3a_explicit_credentials_and_endpoint():
    conf = s3a_conf(access_key="AK", secret_key="SK", endpoint="minio:9000")
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "SK"
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "minio:9000"


def test_abfss_msi_auth_keys_are_account_scoped():
    conf = abfss_conf(account="myacct", auth="oauth-msi")
    host = "myacct.dfs.core.windows.net"
    assert conf[f"spark.hadoop.fs.azure.account.auth.type.{host}"] == "OAuth"
    assert "MsiTokenProvider" in conf[
        f"spark.hadoop.fs.azure.account.oauth.provider.type.{host}"
    ]


def test_abfss_shared_key_requires_key():
    with pytest.raises(ValueError, match="account_key"):
        abfss_conf(account="a", auth="shared-key")


def test_scheme_dispatch_and_account_inference():
    assert object_store_conf("/local/path") == {}
    assert "spark.hadoop.fs.s3a.committer.name" in object_store_conf(
        "s3a://bucket/prefix"
    )
    conf = object_store_conf("abfss://container@acct.dfs.core.windows.net/archive")
    assert any("acct.dfs.core.windows.net" in k for k in conf)


def test_apply_conf_routes_hadoop_keys(spark):
    apply_conf(spark, {"spark.hadoop.fs.s3a.threads.max": "7"})
    hadoop = spark.sparkContext._jsc.hadoopConfiguration()
    assert hadoop.get("fs.s3a.threads.max") == "7"
    hadoop.unset("fs.s3a.threads.max")
