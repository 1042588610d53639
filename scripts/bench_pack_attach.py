#!/usr/bin/env python3
"""Interleaved A/B: attach='pack' (co-partitioned on-disk curve-pack
store) vs attach='shuffle' (arrays ride the candidate join) on a corpus
sized PAST the broadcast threshold — the regime where the broadcast arm
is invalid and 'shuffle' used to be the only plan.

Corpus: the sf trajectories replicated --dup times under distinct ids
with sub-eps offsets (near-duplicates: the hard case for the kernels and
a realistic dense-corpus shape); at --dup 4 over sf0.1 the array payload
estimate is ~50 MB > the 32 MB default autoBroadcastJoinThreshold.
Queries: traj_id % 50 == 0 (the bounded-query-set 100-TB shape; the
query side still broadcast-packs). Rounds interleave the two arms within
one session and embed the same-process CPU-quota probe per round
(sandbox quota drifts minute-to-minute — see BENCH.md protocol notes).

Prints one JSON line. Usage:
    PYTHONPATH=. python scripts/bench_pack_attach.py [--dup 4] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPS, MESH = 15.0, 15.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--dup", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="/tmp/pack_attach_bench_idx")
    args = ap.parse_args()

    import bench as bench_mod
    from frechetrange_spark.session import get_spark, warm_python_workers

    spark = get_spark(master=f"local[{args.cpus}]")
    warm_python_workers(spark)

    from pyspark.sql import functions as F

    from frechetrange_spark.operators.range_query import (
        _broadcast_threshold,
        _est_broadcast_bytes,
        build_grid_index,
        range_query_grid,
    )
    from frechetrange_spark.sources.index_table import read_index, write_index
    from frechetrange_spark.sources.trajectories import (
        assemble_curves,
        trajectory_points,
    )
    from scripts.bench_skew import duplicate

    curves = duplicate(
        assemble_curves(trajectory_points(spark, args.sf_dir)), args.dup
    ).localCheckpoint()
    n_curves = curves.count()
    payload = _est_broadcast_bytes(curves)
    thr_raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")

    t0 = time.perf_counter()
    index_df, meta = build_grid_index(curves, MESH, corner="min_min")
    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    write_index(index_df, args.out, meta, pack=True)
    build_sec = round(time.perf_counter() - t0, 3)
    idx, meta = read_index(spark, args.out)
    queries = idx.filter(F.col("traj_id") % 50 == 0)
    n_q = queries.count()

    def run(arm: str) -> float:
        t0 = time.perf_counter()
        range_query_grid(idx, queries, EPS, meta, attach=arm).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # one untimed warm pass per arm (JVM/codegen/worker heap)
    run("shuffle")
    run("pack")
    trials: dict[str, list[float]] = {"shuffle": [], "pack": []}
    calib = []
    for _ in range(args.rounds):
        calib.append(bench_mod._calib_probe())
        for arm in ("shuffle", "pack"):
            trials[arm].append(run(arm))
    best = {a: min(t) for a, t in trials.items()}
    counts = {
        a: range_query_grid(idx, queries, EPS, meta, attach=a).count()
        for a in ("shuffle", "pack")
    }
    assert counts["shuffle"] == counts["pack"], counts
    print(
        json.dumps(
            {
                "mode": "pack_attach_ab",
                "sf_dir": args.sf_dir,
                "dup": args.dup,
                "n_curves": n_curves,
                "n_queries": n_q,
                "payload_bytes_est": payload,
                "broadcast_threshold": thr_raw,
                "over_threshold": payload > _broadcast_threshold(spark),
                "index_plus_pack_build_sec": build_sec,
                "best": best,
                "speedup_pack_vs_shuffle": round(
                    best["shuffle"] / best["pack"], 3
                ),
                "trials": trials,
                "calib_flop_per_round": calib,
                "n_matches": counts["pack"],
                "protocol": {
                    "ordering": "interleaved_rounds",
                    "aggregate": "min",
                    "warmup": ["jvm", "python_workers", "one_pass_per_arm"],
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
