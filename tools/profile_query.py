#!/usr/bin/env python
"""Per-query isolation profiler (guide §1): time registered queries with the
noop sink (min of N runs, one warm session) and optionally dump
``explain("formatted")`` to a file per query.

Usage:
    python tools/profile_query.py q_bootstrap_ci q_dup_span_exact \
        [--runs 3] [--sf-dir /root/testdata/sf0.1] [--plans plans/r11 --suffix before]

Prints one line per query: ``<name> <min_sec> [runs...]`` and a total.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bifrost_spark import registry
from bifrost_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None, help="directory to write <name>_<suffix>.txt explains")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--full",
        action="store_true",
        help="time plan build + execution together (bench.py times only the "
        "noop action; use --full to account eager checkpoints honestly)",
    )
    args = ap.parse_args()

    spark = get_spark("bifrost-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # warm JVM + Python-worker paths like bench.py does
    qs["q_agg_hash"](spark, "/root/testdata/sf0.001").count()
    qs["q_dedup_embedding"](spark, "/root/testdata/sf0.001").count()

    total = 0.0
    for name in args.names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf_dir)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        runs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if not args.full:
                # bench.py methodology: build untimed, noop timed
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        best = min(runs)
        total += best
        print(f"{name} {best:.3f}  " + " ".join(f"{r:.3f}" for r in runs), flush=True)
    print(f"TOTAL {total:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
