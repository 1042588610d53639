"""F4/F5 filter-pack wiring: result-set invariance, batched-F4 parity with
the scalar kernel, and the funnel-stats output (candidate counts per stage
— SURVEY §7 step 4's contract)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frechetrange_spark.kernels.batch import (
    decide_pairs_arrow,
    greedy_ub_batch,
    pad_curves,
)
from frechetrange_spark.kernels.core import (
    decide_frechet,
    greedy_upper_bound,
    negfilter,
)
from frechetrange_spark.operators.range_query import (
    build_grid_index,
    range_query_bruteforce,
    range_query_grid,
)
from frechetrange_spark.sources.trajectories import curves as load_curves
from tests.conftest import SF_SMALL

EPS, MESH = 15.0, 15.0


def _rng_curves(n, rng):
    out = []
    for _ in range(n):
        k = rng.integers(2, 40)
        steps = rng.normal(0, 1.0, size=(k, 2))
        out.append(np.cumsum(steps, axis=0) + rng.uniform(-5, 5, size=2))
    return out


def test_greedy_ub_batch_matches_scalar():
    rng = np.random.default_rng(7)
    ps = _rng_curves(64, rng)
    qs = _rng_curves(64, rng)
    p, lp = pad_curves(ps)
    q, lq = pad_curves(qs)
    got = greedy_ub_batch(p, q, lp, lq)
    want = np.array([greedy_upper_bound(a, b) for a, b in zip(ps, qs)])
    assert np.array_equal(got, want)
    # upper bound property: decider accepts at the bound
    for a, b, ub in zip(ps, qs, got):
        assert decide_frechet(a, b, ub * (1 + 1e-12) + 1e-12)


def test_filters_never_change_decisions():
    """F4 accept and F5 reject are sound: decide_pairs_arrow answers
    identically with every flag combination."""
    import pyarrow as pa

    rng = np.random.default_rng(11)
    ps = _rng_curves(200, rng)
    qs = _rng_curves(200, rng)
    qxs = pa.array([p[:, 0].tolist() for p in ps])
    qys = pa.array([p[:, 1].tolist() for p in ps])
    xs = pa.array([q[:, 0].tolist() for q in qs])
    ys = pa.array([q[:, 1].tolist() for q in qs])
    for eps in (0.5, 2.0, 8.0):
        base = decide_pairs_arrow(qxs, qys, xs, ys, eps)
        for ga, nr in ((True, False), (False, True), (True, True)):
            got = decide_pairs_arrow(
                qxs, qys, xs, ys, eps, greedy_accept=ga, neg_reject=nr
            )
            assert np.array_equal(got, base), (eps, ga, nr)


def test_negfilter_sound_on_random_pairs():
    rng = np.random.default_rng(13)
    ps = _rng_curves(50, rng)
    qs = _rng_curves(50, rng)
    for p, q in zip(ps, qs):
        for eps in (0.5, 2.0, 8.0):
            if negfilter(p, q, eps):
                assert not decide_frechet(p, q, eps)


@pytest.fixture(scope="module")
def corpus(spark):
    return load_curves(spark, SF_SMALL).localCheckpoint()


def _pairs(df):
    return {(r["query_id"], r["traj_id"]) for r in df.collect()}


def test_grid_query_invariant_under_filter_pack(spark, corpus):
    queries = corpus.filter(F.col("traj_id") % 50 == 0)
    index_df, meta = build_grid_index(corpus, MESH, corner="min_min")
    truth = _pairs(range_query_bruteforce(corpus, queries, EPS))
    plain = _pairs(range_query_grid(index_df, queries, EPS, meta))
    packed = _pairs(
        range_query_grid(
            index_df, queries, EPS, meta, greedy_accept=True, neg_reject=True
        )
    )
    assert plain == truth
    assert packed == truth


def test_funnel_stats_match_plain_result(spark, corpus):
    """Stats mode: accepted rows == the plain match set, every candidate
    carries a stage, and the per-stage counts are a meaningful funnel."""
    queries = corpus.filter(F.col("traj_id") % 50 == 0)
    index_df, meta = build_grid_index(corpus, MESH, corner="min_min")
    plain = _pairs(range_query_grid(index_df, queries, EPS, meta))
    stats = range_query_grid(
        index_df,
        queries,
        EPS,
        meta,
        greedy_accept=True,
        neg_reject=True,
        funnel_stats=True,
    ).localCheckpoint()
    assert _pairs(stats.filter("accepted")) == plain
    counts = {
        r["stage"]: r["n"]
        for r in stats.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == stats.count()
    assert "" not in counts
    valid = {
        "f3_accept",
        "etd_accept",
        "greedy_accept",
        "neg_reject",
        "decider_yes",
        "decider_no",
        "mirror",
    }
    assert set(counts) <= valid | {
        f"simp{i}_{v}" for i in range(4) for v in ("yes", "no")
    }
    # accept stages only ever mark accepted rows, reject stages rejected
    acc_stages = {"f3_accept", "etd_accept", "greedy_accept", "decider_yes"}
    for r in stats.select("stage", "accepted").distinct().collect():
        if r["stage"] in acc_stages or r["stage"].endswith("_yes"):
            assert r["accepted"]
        else:
            assert not r["accepted"]


def test_funnel_stats_symmetric_mirror(spark, corpus):
    """Stats + symmetric self-join: accepted rows still equal the plain
    symmetric result set, and mirrored duplicates carry stage='mirror' so
    per-stage counts remain one row per refined candidate."""
    index_df, meta = build_grid_index(corpus, MESH, corner="min_min")
    plain = _pairs(range_query_grid(index_df, corpus, EPS, meta, symmetric=True))
    stats = range_query_grid(
        index_df, corpus, EPS, meta, symmetric=True, funnel_stats=True
    ).localCheckpoint()
    assert _pairs(stats.filter("accepted")) == plain
    counts = {
        r["stage"]: r["n"]
        for r in stats.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("mirror", 0) > 0
    # every mirror row is an accepted off-diagonal duplicate
    m = stats.filter("stage = 'mirror'")
    assert m.filter(~F.col("accepted")).count() == 0
    assert m.filter(F.col("query_id") == F.col("traj_id")).count() == 0


def test_funnel_stats_entry_query_consistency(spark):
    """The driver-facing funnel_stats entry aggregates the same rows the
    funnel emits: accepted pair count across stages equals the
    range_query entry's match count, and every stage's n_accepted is
    consistent with its verdict kind (yes/accept stages fully accepted,
    no-stages fully rejected)."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    stats = {
        r["stage"]: (r["n_pairs"], r["n_accepted"])
        for r in e.queries()["funnel_stats"](spark, sf).collect()
    }
    spark.catalog.clearCache()
    n_matches = e.queries()["range_query"](spark, sf).count()
    spark.catalog.clearCache()
    assert sum(acc for _, acc in stats.values()) == n_matches
    for stage, (n, acc) in stats.items():
        if stage.endswith(("_yes", "_accept")):
            assert acc == n, stage
        elif stage.endswith("_no"):
            assert acc == 0, stage
