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
