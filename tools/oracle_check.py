#!/usr/bin/env python
"""Spot-check named queries against the DuckDB oracle at one or more SFs.

Usage:
    python tools/oracle_check.py q_bootstrap_ci [more_ids...] \
        [--sfs 0.001,0.01,0.1]

Exit 0 iff every (query, sf) pair matches.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bifrost_spark import registry
from bifrost_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sfs", default="0.001,0.01")
    args = ap.parse_args()

    from tests.oracle_harness import compare, duckdb_connection

    spark = get_spark("bifrost-oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = registry.queries(), registry.oracles()
    bad = 0
    for sf in args.sfs.split(","):
        sf_dir = f"/root/testdata/sf{sf}"
        con = duckdb_connection(sf_dir)
        for name in args.names:
            if name not in oracles:
                print(f"{name} sf{sf}: NO ORACLE (rows-only)")
                continue
            spark_df = qs[name](spark, sf_dir)
            oracle_pdf = con.execute(oracles[name]).df()
            problems = compare(spark_df, oracle_pdf)
            if problems:
                bad += 1
                print(f"{name} sf{sf}: MISMATCH")
                for p in problems:
                    print("   ", p)
            else:
                print(f"{name} sf{sf}: ok ({len(oracle_pdf)} rows)")
        con.close()
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
