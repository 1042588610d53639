"""kNN-by-Fréchet: exactness against distributed all-pairs distances."""

import pytest
from pyspark.sql import functions as F

from frechetrange_spark.operators.knn import (
    _pairs_with_arrays,
    frechet_distances,
    knn_frechet,
)
from frechetrange_spark.sources.trajectories import curves as load_curves
from tests.conftest import SF_SMALL

K = 5


@pytest.fixture(scope="module")
def corpus(spark):
    c = load_curves(spark, SF_SMALL).cache()
    c.count()
    return c


def test_radius_boundary_translated_duplicates():
    """A pair whose true distance EQUALS the prune radius must survive
    decide_radius_prune *without* relying on the ETD pre-accept.

    Translated duplicates are the adversarial case: their Fréchet distance
    is their own ETD, so when the k-th smallest ETD is the pair's ETD the
    radius decision runs exactly at the boundary, where eps*eps =
    sqrt(d2)^2 rounds below d2 (empirically 119/2000 false rejects with
    the bare decider at eps==ETD, 4/2000 at one ulp). Pins the
    1e-12-relative widening in _decide_radius_kernel so a future
    etd_accept / chunk-layout change can't silently drop true top-k
    members."""
    import numpy as np
    import pyarrow as pa

    from frechetrange_spark.kernels.batch import decide_pairs_arrow, etd_batch

    rng = np.random.default_rng(7)
    n = 2000
    bx = np.cumsum(rng.normal(size=12))
    by = np.cumsum(rng.normal(size=12))
    P = np.broadcast_to(np.stack([bx, by], axis=1), (n, 12, 2)).copy()
    shift = rng.normal(size=(n, 1, 2))
    Q = P + shift
    radius = etd_batch(P, Q)  # == the pair's true Fréchet distance

    def col(a):
        return pa.array([row.tolist() for row in a], pa.list_(pa.float64()))

    args = (col(P[:, :, 0]), col(P[:, :, 1]), col(Q[:, :, 0]), col(Q[:, :, 1]))
    # the exact widening _decide_radius_kernel applies, bare decider
    widened = np.nextafter(radius * (1.0 + 1e-12), np.inf)
    keep = decide_pairs_arrow(*args, widened, etd_accept=False)
    assert keep.all(), f"{int((~keep).sum())}/{n} boundary pairs dropped"
    # and the widening is sound: clearly-outside pairs still rejected
    reject = decide_pairs_arrow(*args, radius * 0.999, etd_accept=False)
    assert not reject.any()

    # drive the actual kernel too (it applies the widening internally)
    from frechetrange_spark.operators.knn import _decide_radius_kernel

    rb = pa.RecordBatch.from_arrays(
        [
            pa.array(np.arange(n)),
            pa.array(np.arange(n)),
            *args,
            pa.array(radius),
        ],
        ["query_id", "traj_id", "q_xs", "q_ys", "xs", "ys", "radius"],
    )
    out = list(_decide_radius_kernel(iter([rb])))
    assert sum(b.num_rows for b in out) == n


def test_grid_prefilter_identical_and_sublinear(spark):
    """knn_candidates_grid returns the exact same top-k as the all-pairs
    bound pass, and on a clustered corpus (10 far-apart clusters) its
    candidate stream is sublinear — each query's ring probes stay inside
    its own cluster instead of scoring all N curves."""
    from pyspark.sql import functions as F

    from frechetrange_spark.operators.knn import knn_candidates_grid
    from frechetrange_spark.sources.trajectories import (
        assemble_curves,
        trajectory_points,
    )

    pts = trajectory_points(spark, SF_SMALL).select(
        "traj_id",
        "seq",
        (F.col("x") + (F.col("traj_id") % 10) * 100000.0).alias("x"),
        "y",
    )
    curves = assemble_curves(pts).localCheckpoint()
    queries = curves.filter(F.col("traj_id") % 150 == 0).localCheckpoint()
    n, q = curves.count(), queries.count()

    n_cand = knn_candidates_grid(curves, queries, K, 15.0).count()
    assert n_cand < 0.25 * q * (n - 1), f"{n_cand} of {q * (n - 1)} pairs"

    grid = knn_frechet(curves, queries, k=K, mesh=15.0).toPandas()
    allp = knn_frechet(curves, queries, k=K, mesh=None).toPandas()
    key = ["query_id", "rank"]
    grid = grid.sort_values(key).reset_index(drop=True)
    allp = allp.sort_values(key).reset_index(drop=True)
    assert list(grid["traj_id"]) == list(allp["traj_id"])
    assert list(grid["distance"]) == pytest.approx(list(allp["distance"]))


def test_knn_exact(spark, corpus):
    queries = corpus.filter(F.col("traj_id") % 150 == 0)
    got = knn_frechet(corpus, queries, k=K, mesh=15.0, eps0=2.0).toPandas()

    # brute force: all-pairs distances, top-k in pandas
    all_pairs = (
        queries.select(F.col("traj_id").alias("query_id"))
        .crossJoin(corpus.select("traj_id"))
        .filter(F.col("query_id") != F.col("traj_id"))
    )
    dists = frechet_distances(
        _pairs_with_arrays(corpus, queries, all_pairs)
    ).toPandas()

    for qid, sub in got.groupby("query_id"):
        want = (
            dists[dists["query_id"] == qid]
            .sort_values(["distance", "traj_id"])
            .head(K)
        )
        sub = sub.sort_values("rank")
        assert list(sub["traj_id"]) == list(want["traj_id"]), qid
        assert list(sub["distance"]) == pytest.approx(
            list(want["distance"]), rel=1e-9, abs=1e-9
        )
    assert set(got["query_id"]) == {
        r["traj_id"] for r in queries.select("traj_id").collect()
    }
    assert (got.groupby("query_id").size() == K).all()
