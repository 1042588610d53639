"""Similarity-search tests: exact top-k against a numpy oracle; LSH
near-dup precision (exact) and recall (measured) against the exact pairs."""

import numpy as np
import pytest

from frechetrange_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_ivf,
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


# ---------------------------------------------------------------------------
# IVF coarse quantizer
# ---------------------------------------------------------------------------


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_ivf_recall_on_isotropic_table(spark, emb):
    """recall@5 >= 0.95 vs brute force at the operator defaults on the
    real embeddings table (near-isotropic 64-d — IVF's worst case; the
    defaults spill-assign to compensate)."""
    truth = _topk_sets(ann_topk_bruteforce(emb, k=5))
    got = _topk_sets(ann_topk_ivf(emb, k=5))
    hit = sum(len(got.get(q, set()) & s) for q, s in truth.items())
    total = sum(len(s) for s in truth.values())
    assert hit / total >= 0.95, f"recall {hit}/{total}"


def _clustered_emb(spark, n_clusters=16, per_cluster=50, dim=64):
    """Well-separated deterministic clusters: center c = one-hot-ish
    direction, members = center + small noise."""
    rng = np.random.default_rng(99)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + 0.15 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )


def test_ivf_prunes_hard_on_clustered_corpus(spark):
    """On genuinely clustered data, tight IVF params (assign=1, probe=3
    of 16 cells) still reach recall >= 0.95 — the scan fraction is then
    ~probe/cells, the pruning the index exists for."""
    from frechetrange_spark.operators.similarity import (
        _normalize_rows,
        kmeans_centroids,
    )

    emb_c = _clustered_emb(spark)
    truth = _topk_sets(ann_topk_bruteforce(emb_c, k=5, query_mod=50))
    got = _topk_sets(
        ann_topk_ivf(emb_c, k=5, query_mod=50, n_cells=16, n_probe=3, n_assign=1)
    )
    hit = sum(len(got.get(q, set()) & s) for q, s in truth.items())
    total = sum(len(s) for s in truth.values())
    assert hit / total >= 0.95, f"recall {hit}/{total}"
    # measure the scan fraction offline with the same quantizer
    pdf = emb_c.select("vec_id", "embedding").orderBy("vec_id").toPandas()
    X = _normalize_rows(np.stack(pdf["embedding"].to_numpy()))
    vids = pdf["vec_id"].to_numpy()
    C = kmeans_centroids(X[:4096], 16)
    cells = np.argmax(X @ C.T, axis=1)
    qm = X[vids % 50 == 0]
    frac = 0.0
    for qv in qm:
        probed = np.argsort(-(C @ qv))[:3]
        frac += np.isin(cells, probed).mean()
    frac /= len(qm)
    assert frac <= 0.35, f"scan fraction {frac:.2f}"


def test_ivf_deterministic(spark, emb):
    a = ann_topk_ivf(emb).orderBy("query_id", "rank").toPandas()
    b = ann_topk_ivf(emb).orderBy("query_id", "rank").toPandas()
    assert (a["vec_id"].values == b["vec_id"].values).all()


def test_ivf_partitioned_layout_prunes_files_and_matches(spark, emb, tmp_path):
    """The on-disk IVF layout (ivf_write_partitioned) made real: probing
    reads ONLY the probed ivf_cell=... partition directories (partition
    filter in the plan + actual files touched), and the result equals the
    in-memory ann_topk_ivf for the same centroids/probe/assign."""
    from frechetrange_spark.operators.similarity import (
        ann_topk_ivf,
        ann_topk_ivf_partitioned,
        ivf_write_partitioned,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "ivf")
    n_cells, n_probe, n_assign = 16, 4, 2
    C = ivf_write_partitioned(emb, path, n_cells=n_cells, n_assign=n_assign)
    got_df = ann_topk_ivf_partitioned(
        spark, path, C, k=5, query_mod=50, n_probe=n_probe
    )

    # 1) plan: the cell predicate is a PartitionFilter on the scan
    plan = got_df._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan

    # 2) scan metrics: files actually opened are a strict subset of the
    # table, all inside probed cell directories
    base = spark.read.parquet(path)
    qpdf = got_df.toPandas()
    # recompute the probe union exactly as the operator does
    import numpy as np

    from frechetrange_spark.operators.similarity import _normalize_rows

    qrows = (
        base.filter(F.col("vec_id") % 50 == 0)
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
        .orderBy("vec_id")
        .toPandas()
    )
    qm = _normalize_rows(np.stack(qrows["embedding"].to_numpy()))
    qc = qm @ _normalize_rows(C).T
    probe_union = set(
        int(c)
        for c in np.unique(np.argpartition(-qc, n_probe - 1, axis=1)[:, :n_probe])
    )
    touched = {
        r[0]
        for r in base.filter(F.col("ivf_cell").isin(sorted(probe_union)))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    all_files = {
        r[0]
        for r in base.select(F.input_file_name()).distinct().collect()
    }
    assert len(touched) < len(all_files)
    assert all(any(f"ivf_cell={c}/" in f for c in probe_union) for f in touched)

    # 3) parity with the in-memory IVF at identical parameters
    want = (
        ann_topk_ivf(
            emb, k=5, query_mod=50, n_cells=n_cells, n_probe=n_probe,
            n_assign=n_assign,
        )
        .orderBy("query_id", "rank")
        .toPandas()
    )
    got = qpdf.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (got["query_id"].values == want["query_id"].values).all()
    assert (got["vec_id"].values == want["vec_id"].values).all()
    assert np.allclose(got["cosine"].values, want["cosine"].values, atol=1e-12)


def test_ivf_partitioned_dedups_spill_copies_within_batch(spark, tmp_path):
    """Spill copies of ONE vector coalesced into one Arrow batch must not
    crowd a distinct true neighbor out of the k local top-k slots.

    Adversarial layout: 2 cells, n_assign=2 — every vector lands in BOTH
    cell directories, and Spark's small-file coalescing reads them in one
    batch. Before the in-kernel dedup (_local_topk_frames), the k slots
    filled up with bit-identical copies and the global dropDuplicates
    could never recover the dropped distinct neighbor."""
    from frechetrange_spark.operators.similarity import (
        ann_topk_ivf_partitioned,
        ivf_write_partitioned,
    )

    # vec 0 = the query (vec_id % 50 == 0); cosine order: A(1) > B(2) > C(3)
    rows = [
        (0, [1.0, 0.5]),
        (1, [0.7071, 0.7071]),  # A
        (2, [1.0, 0.0]),        # B
        (3, [0.0, 1.0]),        # C
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = np.array([[1.0, 0.0], [0.0, 1.0]])
    path = str(tmp_path / "ivf_dup")
    ivf_write_partitioned(emb, path, n_cells=2, n_assign=2, centroids=centroids)

    # Force the small cell files into ONE scan partition (one Arrow
    # batch) — at local[32] tiny files get one partition each, which is
    # exactly why the bug never fired at test scale; at 100 TB the scan
    # packs ~128MB of spill files per partition and it does.
    prev = spark.conf.get("spark.sql.files.minPartitionNum", None)
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    try:
        got = (
            ann_topk_ivf_partitioned(
                spark, path, centroids, k=2, query_mod=50, n_probe=2
            )
            .orderBy("rank")
            .toPandas()
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.files.minPartitionNum")
        else:
            spark.conf.set("spark.sql.files.minPartitionNum", prev)
    assert list(got["vec_id"]) == [1, 2]
    assert list(got["rank"]) == [1, 2]


def test_ivf_partitioned_query_set_from_source_prunes_all_store_scans(
    spark, emb, tmp_path
):
    """r06: with ``queries=`` (the source embeddings table), the
    partitioned store appears in the probe plan ONLY behind its
    ivf_cell partition filter — the old fallback collected the query set
    with an unpruned full scan of the store first. Results are identical
    (the store's float64 copies of the float32 source are exact)."""
    import numpy as np

    from frechetrange_spark.operators.similarity import (
        ann_topk_ivf_partitioned,
        ivf_write_partitioned,
    )

    path = str(tmp_path / "ivf_src")
    C = ivf_write_partitioned(emb, path, n_cells=16, n_assign=2)
    got = ann_topk_ivf_partitioned(
        spark, path, C, k=5, query_mod=50, n_probe=4, queries=emb
    )
    # the probe plan's ONLY file scan is the store, and it is
    # partition-filtered; the query set was collected eagerly from the
    # source table, so no unpruned store scan exists anywhere
    phys = got._jdf.queryExecution().executedPlan().toString()
    store_scans = [ln for ln in phys.splitlines() if "FileScan" in ln]
    assert len(store_scans) == 1, phys
    assert "PartitionFilters: [ivf_cell" in store_scans[0]
    fallback = ann_topk_ivf_partitioned(
        spark, path, C, k=5, query_mod=50, n_probe=4
    )
    a = got.orderBy("query_id", "rank").toPandas()
    b = fallback.orderBy("query_id", "rank").toPandas()
    assert a.equals(b)
