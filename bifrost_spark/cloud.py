"""Object-store configuration plumbing: the S3 and Azure parity surface.

The reference ships two uploaders — S3 (s3.clj) and Azure block blobs
(azureblob.clj) — selected by config.  On Spark the sink is just a path
(``s3a://`` / ``abfss://``); what actually differs per store is the Hadoop
connector configuration: credentials, committer choice, and upload tuning.
This module centralizes those as plain dicts so the archival daemon
(main.py) can apply them to any SparkSession, and so they are unit-testable
without the hadoop-aws/hadoop-azure jars on the classpath (this container
has neither — the configs are exercised by key, not by connecting).

Committer rationale (the at-scale correctness point):
  * s3a: the "magic" committer writes task output to a magic path and
    completes multipart uploads at job commit — no rename (S3 has none),
    no list-after-write consistency dependence.  This is the Spark analog
    of the reference's upload-then-commit-offset ordering (s3.clj:40-80):
    data becomes visible atomically at commit.
  * abfss: real renames exist (hierarchical namespace), so the default
    FileOutputCommitter v1 algorithm is correct; the config enables the
    flush/hflush tuning the block-blob uploader in the reference handles
    by size (azureblob.clj block splitting).
"""

from __future__ import annotations

from urllib.parse import urlparse


def s3a_conf(
    *,
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    multipart_size_mb: int = 64,
    max_concurrent_uploads: int = 4,
) -> dict[str, str]:
    """Hadoop confs for an ``s3a://`` archive sink.

    ``max_concurrent_uploads`` mirrors the reference's ``:uploaders-n``
    semaphore (etc/config.example.edn:11, s3.clj:120) as fs.s3a.threads.max;
    credentials default to the provider chain (instance profile / env) when
    not given, which is the production posture."""
    conf = {
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
        "spark.hadoop.fs.s3a.multipart.size": str(multipart_size_mb * 1024 * 1024),
        "spark.hadoop.fs.s3a.threads.max": str(max_concurrent_uploads),
        "spark.hadoop.fs.s3a.connection.maximum": str(max(16, 2 * max_concurrent_uploads)),
        "spark.hadoop.fs.s3a.fast.upload.buffer": "disk",
    }
    if access_key and secret_key:
        conf["spark.hadoop.fs.s3a.access.key"] = access_key
        conf["spark.hadoop.fs.s3a.secret.key"] = secret_key
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    return conf


def abfss_conf(
    *,
    account: str,
    auth: str = "oauth-msi",
    account_key: str | None = None,
    client_id: str | None = None,
) -> dict[str, str]:
    """Hadoop confs for an ``abfss://`` archive sink (Azure parity surface,
    azureblob.clj analog).  ``auth``: "oauth-msi" (managed identity, the
    production posture), or "shared-key" with ``account_key``."""
    host = f"{account}.dfs.core.windows.net"
    conf: dict[str, str] = {
        # block-blob flush tuning — the connector-side analog of the
        # reference's manual block splitting (azureblob.clj)
        "spark.hadoop.fs.azure.write.request.size": str(8 * 1024 * 1024),
        "spark.hadoop.fs.azure.enable.flush": "true",
    }
    if auth == "shared-key":
        if not account_key:
            raise ValueError("shared-key auth requires account_key")
        conf[f"spark.hadoop.fs.azure.account.auth.type.{host}"] = "SharedKey"
        conf[f"spark.hadoop.fs.azure.account.key.{host}"] = account_key
    elif auth == "oauth-msi":
        conf[f"spark.hadoop.fs.azure.account.auth.type.{host}"] = "OAuth"
        conf[f"spark.hadoop.fs.azure.account.oauth.provider.type.{host}"] = (
            "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider"
        )
        if client_id:
            conf[f"spark.hadoop.fs.azure.account.oauth2.msi.client.id.{host}"] = client_id
    else:
        raise ValueError(f"unknown auth mode {auth!r}")
    return conf


def object_store_conf(output_path: str, **kwargs) -> dict[str, str]:
    """Dispatch on the sink URI scheme — the engine's rendering of the
    reference's uploader selection (system.clj chooses s3/azureblob from
    config).  Local/file paths need nothing and return {}."""
    scheme = urlparse(output_path).scheme
    if scheme == "s3a" or scheme == "s3":
        return s3a_conf(**kwargs)
    if scheme == "abfss" or scheme == "abfs":
        if "account" not in kwargs:
            netloc = urlparse(output_path).netloc  # container@account.dfs...
            if "@" in netloc:
                kwargs["account"] = netloc.split("@", 1)[1].split(".", 1)[0]
        return abfss_conf(**kwargs)
    return {}


def apply_conf(spark, conf: dict[str, str]) -> None:
    """Apply runtime-settable confs; hadoop fs.* keys are runtime-settable
    via the hadoopConfiguration (per-FS, no session restart)."""
    hadoop = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        if k.startswith("spark.hadoop."):
            hadoop.set(k[len("spark.hadoop."):], v)
        else:
            spark.conf.set(k, v)
