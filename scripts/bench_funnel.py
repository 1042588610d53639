#!/usr/bin/env python3
"""Simplification-funnel crossover bench: short vs long trajectories.

The bddm funnel (F9) exists for LONG trajectories: each level's ~18-point
simplification makes accept/reject decisions at a fraction of the
full-resolution sweep's cost. On the driver corpus's short (~55-pt)
curves the funnel measured SLOWER than full-resolution refine (see
BENCH.md), so the flagship runs levels=0 — this script shows the other
side of that tradeoff on long curves derived from the same testdata:
every trajectory's step sequence is replayed ``--reps`` times (walk
continues from each lap's endpoint), giving deterministic ~55*reps-point
curves with the same local geometry.

Prints one JSON line:
    PYTHONPATH=. python scripts/bench_funnel.py [--sf-dir DIR] [--reps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MESH = 15.0


def long_curves(spark, sf_dir: str, reps: int):
    from pyspark.sql import functions as F

    from frechetrange_spark.sources.trajectories import (
        assemble_curves,
        trajectory_points,
    )

    # per-lap displacement = (last - first); lap r starts where lap r-1 ended
    ends = trajectory_points(spark, sf_dir).groupBy("traj_id").agg(
        F.max("seq").alias("_n"),
        F.min_by("x", "seq").alias("_x0"),
        F.min_by("y", "seq").alias("_y0"),
        F.max_by("x", "seq").alias("_x1"),
        F.max_by("y", "seq").alias("_y1"),
    )
    pts = trajectory_points(spark, sf_dir).join(ends, "traj_id")
    reps_col = F.explode(F.array(*[F.lit(r) for r in range(reps)]))
    lapped = pts.withColumn("_rep", reps_col).select(
        "traj_id",
        (F.col("_rep") * (F.col("_n") + 1) + F.col("seq")).alias("seq"),
        (F.col("x") + F.col("_rep") * (F.col("_x1") - F.col("_x0"))).alias("x"),
        (F.col("y") + F.col("_rep") * (F.col("_y1") - F.col("_y0"))).alias("y"),
    )
    return assemble_curves(lapped)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--eps", type=float, default=15.0)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from frechetrange_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]")

    from pyspark.sql import functions as F

    from frechetrange_spark.operators.range_query import (
        build_grid_index,
        range_query_grid,
    )
    from frechetrange_spark.operators.simplifications import (
        enrich_with_simplifications,
    )

    base = long_curves(spark, args.sf_dir, args.reps).localCheckpoint()
    n = base.count()
    avg_pts = base.agg(F.avg("n_points")).collect()[0][0]

    def run(levels, fractions):
        c = (
            enrich_with_simplifications(base, levels=levels, fractions=fractions)
            if levels
            else base
        ).persist()
        t0 = time.time()
        c.count()
        build = time.time() - t0
        idx, meta = build_grid_index(c, MESH, corner="min_min")
        best, rows = float("inf"), None
        for _ in range(args.trials):
            t0 = time.time()
            m = range_query_grid(idx, c, args.eps, meta, symmetric=True)
            m.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        rows = m.count()
        c.unpersist()
        return round(build, 2), round(best, 2), rows

    b0, q0, r0 = run(0, None)
    b2, q2, r2 = run(2, (0.07, 0.6))
    assert r0 == r2, "funnel changed the result set"
    print(json.dumps({
        "mode": "funnel_crossover",
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "n_curves": n,
        "avg_points": round(float(avg_pts), 1),
        "eps": args.eps,
        "parallelism": args.cpus,
        "matches": r0,
        "levels0": {"build_sec": b0, "query_sec": q0},
        "levels2": {"build_sec": b2, "query_sec": q2},
        "query_speedup_funnel": round(q0 / q2, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
