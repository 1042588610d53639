#!/usr/bin/env python3
"""spark-submit entry point for the flagship Fréchet range-query pipeline.

    scripts/build_pyfiles.sh   # -> dist/frechetrange_spark.zip
    spark-submit --py-files dist/frechetrange_spark.zip \\
        jobs/run_flagship.py --sf-dir /root/testdata/sf0.01 \\
        --root /tmp/flagship_run --eps 15 --mesh 15 --query-mod 50 \\
        --output /tmp/flagship_run/result

Runs (or resumes, via snapshot checkpoints) curves -> index -> matches and
writes the match pairs as parquet. On a cluster, pass the same zip with
--master yarn/k8s; nothing here assumes local mode.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--root", required=True, help="checkpoint root directory")
    ap.add_argument("--eps", type=float, default=15.0)
    ap.add_argument("--mesh", type=float, default=15.0)
    ap.add_argument("--query-mod", type=int, default=None)
    ap.add_argument("--output", default=None, help="parquet output path")
    ap.add_argument(
        "--funnel-stats",
        action="store_true",
        help="emit one row per refine candidate with its funnel stage and "
        "print per-stage counts (the SURVEY §7 step-4 metrics)",
    )
    args = ap.parse_args()

    import os

    from pyspark.sql import SparkSession

    from frechetrange_spark.plans.flagship import flagship_pipeline
    from frechetrange_spark.session import _MALLOC_ENV, warm_python_workers

    # Export the glibc malloc tunables BEFORE the JVM launches (the local
    # python workers inherit this process's env) and carry them to real
    # cluster executors via spark.executorEnv.* — without
    # MALLOC_TRIM_THRESHOLD_ the pages warm_python_workers pre-faults are
    # munmapped on free and the warmup below is ineffective. No .master()
    # call: spark-submit's --master governs.
    for k, v in _MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    builder = (
        SparkSession.builder.appName("frechetrange-flagship")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in _MALLOC_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    spark = builder.getOrCreate()
    # pre-fault the python-worker heaps before the kernel stages (no-op
    # cost on bare metal; large win under virtualized kernels — SCALE.md)
    warm_python_workers(spark)
    matches = flagship_pipeline(
        spark,
        args.sf_dir,
        args.root,
        eps=args.eps,
        mesh=args.mesh,
        query_mod=args.query_mod,
        funnel_stats=args.funnel_stats,
    )
    if args.funnel_stats:
        from pyspark.sql import functions as F

        rows = (
            matches.groupBy("stage", "accepted")
            .agg(F.count("*").alias("n"))
            .orderBy("stage")
            .collect()
        )
        for r in rows:
            print(f"funnel {r['stage']:>14} accepted={r['accepted']} n={r['n']}")
        n = matches.filter("accepted").count()
    else:
        n = matches.count()
    print(f"flagship matches: {n}")
    if args.output:
        matches.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
