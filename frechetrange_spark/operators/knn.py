"""kNN by Fréchet distance (north-rule extension; the reference has no
top-k — SURVEY §2.5 O5).

Exact algorithm: ε-doubling over the grid index. If at least k curves
(excluding the query itself) decide YES at radius ε, the true k nearest
are all inside that result set; their exact distances (bisection kernel,
K12) are then computed only for that candidate set and ranked. Queries
that haven't accumulated k matches double ε and retry; stragglers fall
back to all-curve distance computation.

Per round everything is one relational plan + one Arrow kernel pass — the
driver only inspects per-query match counts (a k-row collect)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frechetrange_spark.operators.range_query import build_grid_index, range_query_grid


def _distance_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from frechetrange_spark.kernels import frechet_distance

    for pdf in batches:
        dists = np.empty(len(pdf), dtype=np.float64)
        for i, (qxs, qys, xs, ys) in enumerate(
            zip(pdf["q_xs"], pdf["q_ys"], pdf["xs"], pdf["ys"])
        ):
            p = np.column_stack([np.asarray(qxs), np.asarray(qys)])
            t = np.column_stack([np.asarray(xs), np.asarray(ys)])
            dists[i] = frechet_distance(p, t)
        yield pd.DataFrame(
            {
                "query_id": pdf["query_id"].values,
                "traj_id": pdf["traj_id"].values,
                "distance": dists,
            }
        )


def frechet_distances(pairs: DataFrame) -> DataFrame:
    """(query_id, traj_id, distance) for pair rows carrying q_xs/q_ys/xs/ys."""
    return pairs.mapInPandas(
        _distance_kernel, schema="query_id long, traj_id long, distance double"
    )


def _pairs_with_arrays(
    curves: DataFrame, queries: DataFrame, pair_ids: DataFrame
) -> DataFrame:
    q = queries.select(
        F.col("traj_id").alias("query_id"),
        F.col("xs").alias("q_xs"),
        F.col("ys").alias("q_ys"),
    )
    t = curves.select("traj_id", "xs", "ys")
    return pair_ids.join(q, "query_id").join(t, "traj_id").select(
        "query_id", "traj_id", "q_xs", "q_ys", "xs", "ys"
    )


def knn_frechet(
    curves: DataFrame,
    queries: DataFrame,
    k: int,
    mesh: float,
    eps0: float = 1.0,
    max_rounds: int = 8,
) -> DataFrame:
    """(query_id, traj_id, distance, rank): the k nearest trajectories per
    query by continuous Fréchet distance (self excluded), exact. Ties break
    by traj_id ascending."""
    spark = curves.sparkSession
    index_df, meta = build_grid_index(curves, mesh)
    # Each eps-doubling round is a separate Spark action over the SAME
    # index; persist so rounds don't re-run the curve-assembly lineage
    # (at cluster scale this is the pre-written, cell-partitioned index
    # table, so persistence is the read cache for free).
    index_df = index_df.persist()
    queries = queries.persist()
    remaining = queries
    candidate_frames = []
    eps = float(eps0)
    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        matches = (
            range_query_grid(index_df, remaining, eps, meta)
            .filter(F.col("query_id") != F.col("traj_id"))
            .persist()
        )
        counts = matches.groupBy("query_id").agg(F.count("*").alias("n"))
        done_ids = [r["query_id"] for r in counts.filter(F.col("n") >= k).collect()]
        if done_ids:
            done = matches.join(
                spark.createDataFrame(
                    [(i,) for i in done_ids], "query_id long"
                ),
                "query_id",
                "left_semi",
            )
            candidate_frames.append(done)
            remaining = remaining.join(
                spark.createDataFrame([(i,) for i in done_ids], "traj_id long"),
                "traj_id",
                "left_anti",
            )
        eps *= 2.0
    if not remaining.isEmpty():
        # fallback: all curves are candidates for the stragglers
        rest = (
            remaining.select(F.col("traj_id").alias("query_id"))
            .crossJoin(curves.select("traj_id"))
            .filter(F.col("query_id") != F.col("traj_id"))
        )
        candidate_frames.append(rest)
    candidates = candidate_frames[0]
    for f in candidate_frames[1:]:
        candidates = candidates.unionAll(f)
    pairs = _pairs_with_arrays(curves, queries, candidates.distinct())
    dists = frechet_distances(pairs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("traj_id").asc()
    )
    return (
        dists.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "traj_id", "distance", F.col("rank").cast("long").alias("rank"))
    )
