#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line on stdout:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": <sf>, ...}

Each query is materialized with a `noop` sink (full execution, no driver
collect) so the measured time is the distributed plan, not row transfer.

`--scaling` mode (the BASELINE.json north-rule two-cluster-size criterion,
evidenced per driver protocol at two local parallelism levels): re-invokes
this script at local[8] and local[32] on the same input and writes
throughput + scaling efficiency to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    tail = os.path.basename(path.rstrip("/"))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return -1.0


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_bench() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from frechetrange_spark.session import get_spark

    spark = get_spark(app_name=f"bench-local{CPUS}", master=f"local[{CPUS}]")
    # warm the JVM + Arrow path so q1 doesn't absorb session startup
    spark.range(1000).selectExpr("sum(id)").collect()

    qs = entry_mod.queries()
    headline = [
        # flagship: indexed exact Fréchet range query (J1 grid join + K5 DP)
        "range_query",
        # candidate-generation joins (J1 / J3) — the shuffle-heavy core
        "grid_candidates",
        "endpoint_candidates",
        # kNN by Fréchet (eps-doubling + exact bisection)
        "knn_frechet",
        # web-text pipeline
        "token_stats",
        "minhash_lsh",
        "simhash_pairs",
        # similarity search over embeddings
        "ann_topk",
        # tiling / raster-vector
        "tile_pyramid",
        "point_in_polygon",
    ]
    timings: dict[str, float] = {}
    for name in headline:
        fn = qs[name]
        t0 = time.perf_counter()
        _materialize(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    # flagship throughput: queries/sec over the range-query workload
    n_queries = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(f"doc_id % {entry_mod.QUERY_MOD} = 0")
        .count()
    )
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "parallelism": CPUS,
        "range_query_workload": n_queries,
        "range_query_qps": round(n_queries / timings["range_query"], 2)
        if timings["range_query"] > 0
        else None,
    }
    spark.stop()
    return result


def run_scaling(levels=(8, 32)) -> None:
    """Run the flagship suite at two parallelism levels; write BENCH.md."""
    rows = []
    for n in levels:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), SPARK_GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        rows.append(json.loads(out.stdout.strip().splitlines()[-1]))
    n0, n1 = levels
    r0, r1 = rows
    # scaling efficiency: speedup achieved / speedup available
    speedup = r0["value"] / r1["value"] if r1["value"] else float("nan")
    eff = speedup / (n1 / n0)
    qps_eff = (
        (r1["range_query_qps"] / r0["range_query_qps"]) / (n1 / n0)
        if r0.get("range_query_qps")
        else None
    )
    lines = [
        "# BENCH — measured throughput and scaling efficiency",
        "",
        f"Input: `{SF_DIR}` (sf={r0['sf']}), identical bytes at both levels.",
        "Protocol per driver instructions: the north rule's two-cluster-size",
        f"criterion evidenced at two local parallelism levels (local[{n0}] vs",
        f"local[{n1}] = N and 4N cores), same code, same input.",
        "",
        "| parallelism | suite total (s) | range-query qps | per-query (s) |",
        "|---|---|---|---|",
    ]
    for n, r in zip(levels, rows):
        per_q = ", ".join(f"{k}={v}" for k, v in r["queries"].items())
        lines.append(
            f"| local[{n}] | {r['value']} | {r.get('range_query_qps')} | {per_q} |"
        )
    lines += [
        "",
        f"- suite speedup local[{n0}]→local[{n1}]: **{speedup:.2f}×** over a "
        f"{n1 // n0}× core increase → scaling efficiency **{eff:.2f}**",
    ]
    if qps_eff is not None:
        lines.append(
            f"- flagship range-query qps scaling efficiency: **{qps_eff:.2f}** "
            f"({r0['range_query_qps']} → {r1['range_query_qps']} qps)"
        )
    lines += [
        "",
        "Efficiency = (T_N / T_4N) / (4N / N); the north rule requires ≥ 0.8.",
        "Raw JSON:",
        "```json",
        json.dumps(rows[0]),
        json.dumps(rows[1]),
        "```",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"levels": list(levels), "efficiency": round(eff, 3), "rows": rows}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
