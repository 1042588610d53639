"""End-to-end range-query correctness: the indexed pipeline must produce
exactly the brute-force result set (order-insensitive id pairs) — the
reference's own N-version-agreement oracle style (benchmark/test.py:26-78)."""

import pytest
from pyspark.sql import functions as F

from frechetrange_spark.operators.range_query import (
    build_grid_index,
    choose_corner,
    grid_candidates,
    range_query_bruteforce,
    range_query_grid,
)
from frechetrange_spark.sources.trajectories import curves as load_curves
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def corpus(spark):
    c = load_curves(spark, SF_SMALL).cache()
    c.count()
    return c


def _pairs(df):
    return {(r["query_id"], r["traj_id"]) for r in df.collect()}


@pytest.mark.parametrize("eps,mesh", [(5.0, 5.0), (15.0, 15.0), (30.0, 15.0)])
def test_grid_matches_bruteforce(spark, corpus, eps, mesh):
    queries = corpus.filter(F.col("traj_id") % 50 == 0)
    truth = _pairs(range_query_bruteforce(corpus, queries, eps))
    index_df, meta = build_grid_index(corpus, mesh)
    got = _pairs(range_query_grid(index_df, queries, eps, meta))
    assert got == truth
    # sanity: every query matches itself
    qids = {r["traj_id"] for r in queries.select("traj_id").collect()}
    assert {(q, q) for q in qids} <= got


def test_candidates_superset_and_filters_sound(spark, corpus):
    eps, mesh = 15.0, 15.0
    queries = corpus.filter(F.col("traj_id") % 50 == 0)
    truth = _pairs(range_query_bruteforce(corpus, queries, eps))
    index_df, meta = build_grid_index(corpus, mesh)
    cand = grid_candidates(index_df, queries, eps, meta)
    cand_pairs = {
        (r["q_traj_id"], r["traj_id"])
        for r in cand.select("q_traj_id", "traj_id").collect()
    }
    assert truth <= cand_pairs  # filters are necessary conditions only
    f3 = {
        (r["q_traj_id"], r["traj_id"])
        for r in cand.filter("accept_f3").select("q_traj_id", "traj_id").collect()
    }
    assert f3 <= truth  # F3 is a sufficient condition


def test_choose_corner_is_deterministic(spark, corpus):
    c1 = choose_corner(corpus, 15.0)
    c2 = choose_corner(corpus, 15.0)
    assert c1 == c2
    assert c1 in {"min_min", "min_max", "max_min", "max_max"}


def test_salted_candidates_identical(spark):
    """Hot-cell salting changes the physical plan only: candidate pair sets
    are identical with and without it (SURVEY §4 skew row)."""
    from frechetrange_spark.operators.range_query import (
        build_grid_index,
        grid_candidates,
    )
    from frechetrange_spark.sources.trajectories import (
        assemble_curves,
        trajectory_points,
    )
    from pyspark.sql import functions as F

    curves = assemble_curves(
        trajectory_points(spark, "/root/testdata/sf0.001")
    ).persist()
    queries = curves.filter(F.col("traj_id") % 20 == 0)
    idx, meta = build_grid_index(curves, 15.0, corner="min_min")
    plain = set(
        map(
            tuple,
            grid_candidates(idx, queries, 15.0, meta)
            .select("q_traj_id", "traj_id")
            .collect(),
        )
    )
    salted = set(
        map(
            tuple,
            grid_candidates(idx, queries, 15.0, meta, salt=8)
            .select("q_traj_id", "traj_id")
            .collect(),
        )
    )
    assert salted == plain
