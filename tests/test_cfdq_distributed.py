"""CFDQ in the distributed path: portals stored as index columns
(enrich_with_portals) feeding the K6 sparse decider refine
(range_query_cfdq) — parity with the K5 funnel and brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frechetrange_spark.operators.range_query import (
    build_grid_index,
    range_query_bruteforce,
    range_query_cfdq,
    range_query_grid,
)
from frechetrange_spark.operators.simplifications import (
    enrich_with_portals,
    enrich_with_simplifications,
)
from frechetrange_spark.sources.trajectories import curves as load_curves
from tests.conftest import SF_SMALL

EPS, MESH = 15.0, 15.0


@pytest.fixture(scope="module")
def indexed(spark):
    curves = load_curves(spark, SF_SMALL)
    enriched = enrich_with_portals(
        enrich_with_simplifications(curves, levels=2, fractions=(0.07, 0.6))
    ).localCheckpoint()
    return enriched


def _pairs(df):
    return {(r["query_id"], r["traj_id"]) for r in df.collect()}


def test_portal_columns_present_and_meaningful(indexed):
    rows = indexed.select(
        "traj_id",
        F.size("portal_src").alias("n"),
        "portal_src",
        "portal_dst",
        "portal_dist",
    ).collect()
    # portals exist for non-trivial curves
    assert sum(r["n"] for r in rows) > 0
    for r in rows:
        src = np.array(r["portal_src"])
        dst = np.array(r["portal_dst"])
        dist = np.array(r["portal_dist"])
        assert len(src) == len(dst) == len(dist)
        if len(src):
            # jump map invariants: no adjacent portals, src-grouped
            assert (dst - src >= 2).all()
            assert (np.diff(src) >= 0).all()
            assert (dist >= 0).all()


def test_cfdq_engine_matches_k5_and_bruteforce(spark, indexed):
    queries = indexed.filter(F.col("traj_id") % 50 == 0)
    index_df, meta = build_grid_index(indexed, MESH, corner="min_min")
    truth = _pairs(range_query_bruteforce(indexed, queries, EPS))
    k5 = _pairs(range_query_grid(index_df, queries, EPS, meta))
    cfdq = _pairs(range_query_cfdq(index_df, queries, EPS, meta))
    assert k5 == truth
    assert cfdq == truth


def test_cfdq_requires_portal_columns(spark):
    curves = load_curves(spark, SF_SMALL)
    index_df, meta = build_grid_index(curves, MESH, corner="min_min")
    with pytest.raises(ValueError, match="portal column"):
        range_query_cfdq(index_df, curves, EPS, meta)
