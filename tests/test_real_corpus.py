"""Real-corpus N-version regression on the reference's shipped data.

The reference's de-facto integration oracle is cross-engine agreement on a
real corpus (benchmark/test.py:26-74 runs the same query through the dv,
bb, and tue engines and compares result sets; data/sanfrancisco.ssv ships
in-repo: 388 taxi trajectories, 44,602 points, lon/lat degrees). This file
is the Spark analogue: the dv grid engine, the bb signature engine, and
the bddm di-hash engine must return identical result sets, all equal to
the brute-force decider, on the real coordinates — which stress float
edge cases (near-duplicate GPS fixes, collinear runs, tiny segments) that
synthetic random walks don't.

Also spot-checks the three decision kernels (K5 free-space DP, K4 bb
divide-&-conquer, K6 CFDQ sparse) against each other on real pairs at a
near-critical eps, and asserts the candidate funnel orderings
(matches ⊆ candidates, candidate counts monotone in filter strength).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frechetrange_spark.operators.dihash import (
    dihash_range_query,
    endpoint_candidates,
)
from frechetrange_spark.operators.range_query import (
    build_grid_index,
    grid_candidates,
    range_query_bruteforce,
    range_query_grid,
)
from frechetrange_spark.operators.signature import (
    bb_range_query,
    signature_candidates,
)
from frechetrange_spark.sources.trajectories import assemble_curves, read_ssv

SSV = "/root/reference/data/sanfrancisco.ssv"
QUERY_MOD = 5  # 77 query curves out of 388


@pytest.fixture(scope="module")
def corpus(spark):
    pts = read_ssv(spark, SSV)
    return assemble_curves(pts).localCheckpoint()


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("traj_id") % QUERY_MOD == 0)


def _pairs(df):
    return {(r["query_id"], r["traj_id"]) for r in df.collect()}


def test_corpus_shape(spark, corpus):
    """The SSV reader reproduces the corpus exactly: 388 trajectories,
    44,602 points, San Francisco bbox."""
    pts = read_ssv(spark, SSV)
    assert pts.count() == 44602
    assert corpus.count() == 388
    row = corpus.agg(
        F.min("min_x"), F.max("max_x"), F.min("min_y"), F.max("max_y"),
        F.max("n_points"),
    ).collect()[0]
    assert -123.0 < row[0] < row[1] < -122.0
    assert 37.0 < row[2] < row[3] < 38.0
    assert row[4] == 128


# Golden result-set sizes for the fixed query workload (deterministic
# data + exact decider => exact counts; a change here means a semantics
# change in some engine, not noise).
GOLDEN = {0.01: 91, 0.02: 220, 0.05: 1642}


@pytest.mark.parametrize("eps", sorted(GOLDEN))
def test_three_engines_agree_on_real_corpus(corpus, queries, eps):
    """dv grid == bb signature == bddm di-hash == brute force on the
    reference's own data — the N-version oracle of benchmark/test.py."""
    mesh = 10.0 * eps  # the reference's build convention (test.py:44)
    truth = _pairs(range_query_bruteforce(corpus, queries, eps))

    index_df, meta = build_grid_index(corpus, mesh)
    dv = _pairs(range_query_grid(index_df, queries, eps, meta))
    bb = _pairs(bb_range_query(corpus, queries, eps, mesh))
    dh = _pairs(dihash_range_query(corpus, queries, eps, mesh))

    assert dv == truth
    assert bb == truth
    assert dh == truth
    if GOLDEN[eps] is not None:
        assert len(truth) == GOLDEN[eps]
    # every query matches itself
    qids = {r["traj_id"] for r in queries.select("traj_id").collect()}
    assert {(q, q) for q in qids} <= truth


def test_cfdq_engine_agrees_on_real_corpus(spark, corpus, queries):
    """The fourth engine — portal-enriched index + K6 sparse decider —
    returns the same golden result set on the real taxi corpus."""
    from frechetrange_spark.operators.range_query import range_query_cfdq
    from frechetrange_spark.operators.simplifications import (
        enrich_with_portals,
        enrich_with_simplifications,
    )

    eps = 0.02
    mesh = 10.0 * eps
    enriched = enrich_with_portals(
        enrich_with_simplifications(corpus, levels=2, fractions=(0.07, 0.6))
    ).localCheckpoint()
    q = enriched.filter(F.col("traj_id") % QUERY_MOD == 0)
    index_df, meta = build_grid_index(enriched, mesh)
    got = _pairs(range_query_cfdq(index_df, q, eps, meta))
    assert len(got) == GOLDEN[eps]
    assert got == _pairs(range_query_bruteforce(corpus, queries, eps))


def test_candidate_funnel_ordering(corpus, queries):
    """Funnel-stage candidate counts on the real corpus: matches are a
    subset of every engine's candidate set, and the bb signature set (F1 +
    Chebyshev-MBR) is a subset of the di-hash set (F1 only, modulo its
    strict-< edge)."""
    eps, mesh = 0.02, 0.2
    truth = _pairs(range_query_bruteforce(corpus, queries, eps))

    index_df, meta = build_grid_index(corpus, mesh)
    grid_cand = _pairs(
        grid_candidates(index_df, queries, eps, meta).select(
            F.col("q_traj_id").alias("query_id"), "traj_id"
        )
    )
    sig_cand = _pairs(
        signature_candidates(corpus, queries, eps, mesh).select(
            F.col("q_traj_id").alias("query_id"), "traj_id"
        )
    )
    dh_cand = _pairs(endpoint_candidates(corpus, queries, eps, mesh))

    assert truth <= grid_cand
    assert truth <= sig_cand
    # di-hash uses strict <; boundary pairs may be candidates elsewhere
    # but matches always sit strictly inside on this corpus
    assert truth <= dh_cand
    # signature = endpoint filter + MBR Chebyshev: strictly stronger
    # than the endpoint-only probe (up to the strict-< boundary)
    assert sig_cand <= dh_cand
    # every filter prunes something on real data
    n_all = corpus.count() * queries.count()
    assert len(dh_cand) < n_all
    assert len(sig_cand) <= len(dh_cand)
    assert len(truth) <= len(sig_cand)


def test_kernels_agree_near_critical(corpus, queries):
    """K5 (free-space DP), K4 (bb divide-&-conquer), and K6 (CFDQ sparse,
    portals on and off) agree on real curve pairs probed at eps values
    bracketing each pair's true distance."""
    from frechetrange_spark.kernels.bb_decider import decide_frechet_bb
    from frechetrange_spark.kernels.cfdq import (
        agarwal_with_portals,
        compile_portals,
        decide_frechet_cfdq,
    )
    from frechetrange_spark.kernels.core import decide_frechet, frechet_distance

    rows = (
        queries.select("traj_id", "xs", "ys")
        .limit(8)
        .collect()
    )
    curves_np = [
        np.column_stack([np.asarray(r["xs"]), np.asarray(r["ys"])]) for r in rows
    ]
    checked = 0
    for i in range(len(curves_np)):
        for j in range(i + 1, len(curves_np)):
            p, q = curves_np[i], curves_np[j]
            d = frechet_distance(p, q)
            _, ports = agarwal_with_portals(p, d / 4.0)
            pmap = compile_portals([ports])
            for eps in (0.5 * d, 0.999 * d, 1.001 * d, 2.0 * d):
                if eps <= 0.0:
                    continue
                want = decide_frechet(p, q, eps)
                assert decide_frechet_bb(p, q, eps) == want
                assert decide_frechet_cfdq(p, q, eps) == want
                assert (
                    decide_frechet_cfdq(
                        p, q, eps, base_query_delta=eps, portals=pmap
                    )
                    == want
                )
                checked += 1
    assert checked >= 100
