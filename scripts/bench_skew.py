#!/usr/bin/env python3
"""Hot-cell skew bench: explicit join-key salting vs an unsalted
sort-merge join on an urban-style corpus where ~80% of trajectories
share ONE grid cell.

Why AQE alone does not fix this: AQE's skew-join split triggers on
shuffle-partition BYTES, but a hot grid cell is small in bytes (a few
thousand curve rows) and only explodes at JOIN FAN-OUT time (every query
in the cell meets every curve in the cell) — so the unsalted plan runs
the entire hot cell's quadratic work in one task no matter what AQE
does. grid_candidates(salt=k) spreads exactly that fan-out over k tasks
(dataset side hashed, query side exploded k ways; every pair still meets
exactly once — parity-tested in tests/test_range_query.py).

Corpus: the sf trajectories translated so that traj_id % 10 < 8 lands
its MBR corner in cell (0,0) and the rest spread over a 40x37 cell grid
— deterministic, derived only from the driver-provided parquet.

Prints one JSON line. Usage:
    PYTHONPATH=. python scripts/bench_skew.py [--sf-dir DIR] [--salt 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPS, MESH = 15.0, 15.0


def skewed_curves(spark, sf_dir: str):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from frechetrange_spark.sources.trajectories import (
        assemble_curves,
        trajectory_points,
    )

    pts = trajectory_points(spark, sf_dir)
    w = Window.partitionBy("traj_id")
    pts = pts.withColumn("_mx", F.min("x").over(w)).withColumn(
        "_my", F.min("y").over(w)
    )
    hot = F.col("traj_id") % 10 < 8
    # hot curves: corner into cell (0,0) with sub-cell jitter; cold curves
    # spread over a 40x37 cell grid
    ox = F.when(hot, (F.col("traj_id") % 13) * 0.5).otherwise(
        (F.col("traj_id") % 40) * MESH
    )
    oy = F.when(hot, (F.col("traj_id") % 11) * 0.5).otherwise(
        (F.col("traj_id") % 37) * MESH
    )
    pts = pts.select(
        "traj_id",
        "seq",
        (F.col("x") - F.col("_mx") + ox).alias("x"),
        (F.col("y") - F.col("_my") + oy).alias("y"),
    )
    return assemble_curves(pts)


def duplicate(curves, dup: int):
    """Scale the corpus by replaying each curve under ``dup`` distinct ids
    with sub-cell jitter — hot-cell membership (and so the join fan-out's
    quadratic growth) is preserved."""
    from pyspark.sql import functions as F

    if dup <= 1:
        return curves
    base = curves.count()
    parts = []
    for d in range(dup):
        off = F.lit(float(d) * 0.25)
        parts.append(
            curves.select(
                (F.col("traj_id") + d * base).alias("traj_id"),
                F.transform("xs", lambda v: v + off).alias("xs"),
                F.transform("ys", lambda v: v + off).alias("ys"),
                "n_points",
                (F.col("x_first") + off).alias("x_first"),
                (F.col("y_first") + off).alias("y_first"),
                (F.col("x_last") + off).alias("x_last"),
                (F.col("y_last") + off).alias("y_last"),
                (F.col("min_x") + off).alias("min_x"),
                (F.col("max_x") + off).alias("max_x"),
                (F.col("min_y") + off).alias("min_y"),
                (F.col("max_y") + off).alias("max_y"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument(
        "--dup",
        type=int,
        default=4,
        help="corpus duplication factor — the hot cell's join fan-out "
        "grows quadratically, modeling the cell sizes a 100 TB urban "
        "corpus produces",
    )
    args = ap.parse_args()

    from frechetrange_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]")
    # force the shuffle join path — a broadcast join has no skew to fix
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    from pyspark.sql import functions as F

    from frechetrange_spark.operators.range_query import (
        build_grid_index,
        grid_candidates,
    )

    curves = duplicate(
        skewed_curves(spark, args.sf_dir), args.dup
    ).localCheckpoint()
    n = curves.count()
    index_df, meta = build_grid_index(curves, MESH, corner="min_min")
    hist = (
        index_df.groupBy("cell_x", "cell_y")
        .count()
        .orderBy(F.desc("count"))
        .limit(3)
        .collect()
    )
    top_cells = [int(r["count"]) for r in hist]

    def run(salt):
        best = float("inf")
        for _ in range(args.trials):
            spark.catalog.clearCache()
            t0 = time.time()
            cnt = grid_candidates(index_df, curves, EPS, meta, salt=salt).count()
            best = min(best, time.time() - t0)
        return best, cnt

    # salt=1 forces the unsalted plan; salt=None is the DEFAULT path,
    # which applies the data-driven meta['salt'] chosen by choose_salt at
    # index-build time — no manual flag; args.salt is the manual baseline
    t_plain, n_plain = run(1)
    t_auto, n_auto = run(None)
    t_manual, n_manual = run(args.salt)
    assert n_plain == n_auto == n_manual, "salting changed the candidate set"

    print(json.dumps({
        "mode": "skew_join",
        "sf_dir": args.sf_dir,
        "dup": args.dup,
        "parallelism": args.cpus,
        "n_curves": n,
        "top_cell_sizes": top_cells,
        "candidates": n_plain,
        "unsalted_sec": round(t_plain, 3),
        "auto_salt": meta.get("salt"),
        "auto_salted_sec": round(t_auto, 3),
        "auto_speedup": round(t_plain / t_auto, 2),
        "manual_salt": args.salt,
        "manual_salted_sec": round(t_manual, 3),
        "manual_speedup": round(t_plain / t_manual, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
