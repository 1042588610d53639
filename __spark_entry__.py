"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship indexed Fréchet range query at sf0.001.
``queries()`` / ``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 with (where SQL-expressible) a DuckDB oracle over the same
parquet tables. Column names/aliases match between the Spark result and the
oracle SQL so the driver's sorted value-hash compares bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frechetrange_spark import oracles
from frechetrange_spark.operators.dihash import endpoint_candidates
from frechetrange_spark.operators.range_query import (
    build_grid_index,
    grid_candidates,
    range_query_grid,
)
from frechetrange_spark.sources.trajectories import (
    assemble_curves,
    trajectory_points,
)

EPS = 15.0
MESH = 15.0
QUERY_MOD = 50  # query workload = trajectories with traj_id % 50 == 0


def _curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assemble_curves(trajectory_points(spark, sf_dir))


def _scalar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _curves(spark, sf_dir).select(
        "traj_id",
        F.col("n_points").cast("long").alias("n_points"),
        "min_x",
        "max_x",
        "min_y",
        "max_y",
        "x_first",
        "y_first",
        "x_last",
        "y_last",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: indexed exact Fréchet range query on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    curves = _curves(spark, sf_dir)
    queries = curves.filter(F.col("traj_id") % QUERY_MOD == 0)
    index_df, meta = build_grid_index(curves, MESH, corner="min_min")
    return range_query_grid(index_df, queries, EPS, meta)


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------

def _q_traj_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trajectory_points(spark, sf_dir).select(
        "traj_id", F.col("seq").cast("long").alias("seq"), "x", "y"
    )


def _q_curve_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scalar_features(spark, sf_dir)


def _q_grid_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_df, _ = build_grid_index(_curves(spark, sf_dir), MESH, corner="min_min")
    return index_df.select("traj_id", "cell_x", "cell_y")


def _q_grid_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    curves = _curves(spark, sf_dir)
    queries = curves.filter(F.col("traj_id") % QUERY_MOD == 0)
    index_df, meta = build_grid_index(curves, MESH, corner="min_min")
    return grid_candidates(index_df, queries, EPS, meta).select(
        F.col("q_traj_id").alias("query_id"), "traj_id"
    )


def _q_endpoint_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    curves = _curves(spark, sf_dir)
    queries = curves.filter(F.col("traj_id") % QUERY_MOD == 0)
    return endpoint_candidates(curves, queries, EPS, MESH)


def _q_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    curves = _curves(spark, sf_dir)
    queries = curves.filter(F.col("traj_id") % QUERY_MOD == 0)
    index_df, meta = build_grid_index(curves, MESH, corner="min_min")
    return range_query_grid(index_df, queries, EPS, meta)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "traj_points": _q_traj_points,
        "curve_features": _q_curve_features,
        "grid_cells": _q_grid_cells,
        "grid_candidates": _q_grid_candidates,
        "endpoint_candidates": _q_endpoint_candidates,
        "range_query": _q_range_query,  # exact decider: rows-only check
    }


def oracle_sql() -> dict[str, str]:
    return {
        "traj_points": oracles.POINTS_SQL,
        "curve_features": oracles.CURVE_FEATURES_SQL,
        "grid_cells": oracles.GRID_CELLS_SQL,
        "grid_candidates": oracles.GRID_CANDIDATES_SQL,
        "endpoint_candidates": oracles.ENDPOINT_CANDIDATES_SQL,
        # "range_query": non-SQL-expressible (free-space DP decider)
    }
