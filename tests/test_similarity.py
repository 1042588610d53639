"""Similarity-search tests: exact top-k against a numpy oracle; LSH
near-dup precision (exact) and recall (measured) against the exact pairs."""

import numpy as np
import pytest

from frechetrange_spark.operators.similarity import (
    ann_topk_bruteforce,
    hyperplane_signatures,
    neardup_exact,
    neardup_lsh,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()
    e.count()
    return e


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.select("vec_id", "embedding").orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


def test_ann_topk_matches_numpy(spark, emb, emb_np):
    ids, m = emb_np
    k, mod = 5, 50
    got = ann_topk_bruteforce(emb, k=k, query_mod=mod).toPandas()
    qids = ids[ids % mod == 0]
    for qid in qids:
        qv = m[ids == qid][0]
        cos = m @ qv
        mask = ids != qid
        order = np.lexsort((ids[mask], -cos[mask]))
        want_ids = ids[mask][order][:k]
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert list(sub["vec_id"]) == list(want_ids), qid
        want_cos = cos[mask][order][:k]
        assert np.allclose(sub["cosine"].values, want_cos, atol=1e-12)


def test_neardup_exact_matches_numpy(spark, emb, emb_np):
    ids, m = emb_np
    tau = 0.45
    got = {
        (r["vec_id_1"], r["vec_id_2"]) for r in neardup_exact(emb, tau).collect()
    }
    cos = m @ m.T
    ii, jj = np.nonzero(cos >= tau)
    want = {(ids[i], ids[j]) for i, j in zip(ii, jj) if ids[i] < ids[j]}
    assert got == want
    assert len(want) > 0  # non-trivial at this tau


def test_lsh_neardup_subset_and_recall(spark, emb):
    tau = 0.45
    exact = {
        (r["vec_id_1"], r["vec_id_2"]) for r in neardup_exact(emb, tau).collect()
    }
    approx = {
        (r["vec_id_1"], r["vec_id_2"]) for r in neardup_lsh(emb, tau).collect()
    }
    assert approx <= exact  # exact precision (verified pairs)
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.5, f"LSH recall too low: {recall:.2f}"


def test_signatures_deterministic(spark, emb):
    a = hyperplane_signatures(emb).orderBy("vec_id").toPandas()
    b = hyperplane_signatures(emb).orderBy("vec_id").toPandas()
    assert (a["sig"].values == b["sig"].values).all()
    assert a["sig"].nunique() > 1
