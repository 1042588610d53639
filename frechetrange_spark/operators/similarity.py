"""Similarity search over the embeddings table (array<float> column).

- ``ann_topk_bruteforce``: exact cosine top-k. The query matrix (small) is
  captured into an Arrow-batched ``mapInPandas`` kernel that computes one
  float64 matmul per batch and emits only each batch's local top-k, so the
  shuffle carries O(n_queries * k * n_partitions) rows; a window takes the
  global top-k. This is the scale baseline: one pass over the base table,
  no all-pairs shuffle.
- ``hyperplane_signatures`` / ``neardup_lsh``: random-hyperplane (SimHash
  for vectors) bucketing — the 100-TB path. Candidates meet only inside a
  band bucket; exact cosine verifies each candidate pair. Deterministic:
  hyperplanes come from a fixed-seed PCG64 generator.
- ``neardup_exact``: exact cosine-threshold pairs via the same batched
  matmul pattern (for verification and small corpora).

Ties everywhere break by vec_id ascending so results are deterministic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LSH_SEED = 20240101
LSH_BITS = 16
# 8 bands x 2 bits: for cosine tau ~= 0.45 (bit-collision p ~= 0.65) the
# band-match probability is p^2 ~= 0.42 and 8 bands give ~0.99 recall;
# tune (bands, bits) per tau at scale — fewer, longer bands for higher tau.
LSH_BANDS = 8
LSH_BAND_BITS = LSH_BITS // LSH_BANDS


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64, copy=False)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def _collect_queries(emb: DataFrame, query_mod: int) -> tuple[np.ndarray, np.ndarray]:
    q = (
        emb.filter(F.col("vec_id") % query_mod == 0)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .toPandas()
    )
    qids = q["vec_id"].to_numpy()
    qm = _normalize_rows(np.stack(q["embedding"].to_numpy()))
    return qids, qm


def ann_topk_bruteforce(
    emb: DataFrame, k: int = 5, query_mod: int = 50
) -> DataFrame:
    """(query_id, vec_id, cosine, rank): exact top-k cosine neighbors for
    every query vector (vec_id % query_mod == 0), self excluded."""
    qids, qm = _collect_queries(emb, query_mod)
    kk = int(k)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = _normalize_rows(np.stack(pdf["embedding"].to_numpy()))
            vids = pdf["vec_id"].to_numpy()
            cos = qm @ base.T  # (nq, nb)
            out = []
            for qi, qid in enumerate(qids):
                row = cos[qi]
                mask = vids != qid  # exclude self
                cand_idx = np.nonzero(mask)[0]
                if cand_idx.size == 0:
                    continue
                take = min(kk, cand_idx.size)
                # batch-local top-k (argpartition), ties resolved later
                part = cand_idx[
                    np.argpartition(-row[cand_idx], take - 1)[:take]
                ]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": vids[part],
                            "cosine": row[part],
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "vec_id": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )

    local = emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="query_id long, vec_id long, cosine double"
    )
    return _topk_window(local, kk)


IVF_SEED = 20240202


def _assign_cells(m_norm: np.ndarray, Cn: np.ndarray, n_assign: int) -> np.ndarray:
    """(B, n_assign) nearest-centroid cells per normalized row (the IVF
    multi-assign "spill") — single source for the in-memory kernel and
    the partitioned writer."""
    sim = m_norm @ Cn.T
    if n_assign == 1:
        return np.argmax(sim, axis=1)[:, None]
    return np.argpartition(-sim, n_assign - 1, axis=1)[:, :n_assign]


def _local_topk_frames(
    qids: np.ndarray,
    qm: np.ndarray,
    base: np.ndarray,
    vids: np.ndarray,
    k: int,
    mask_for,
) -> pd.DataFrame:
    """Per-query local top-k over one Arrow batch; ``mask_for(qi)`` gives
    the boolean candidate mask. Shared by the in-memory and partitioned
    IVF kernels so their selection semantics cannot diverge.

    Duplicate vec_ids within the batch (multi-assign spill copies of the
    same vector, which Spark's small-file coalescing routinely lands in
    one batch) are collapsed BEFORE the k slots are filled — otherwise
    two bit-identical copies of one vector could crowd a distinct true
    neighbor out of the local top-k and the global dedup+window could
    never get it back."""
    out = []
    for qi, qid in enumerate(qids):
        mask = mask_for(qi) & (vids != qid)
        cand_idx = np.nonzero(mask)[0]
        if cand_idx.size == 0:
            continue
        first = np.unique(vids[cand_idx], return_index=True)[1]
        if first.size < cand_idx.size:
            cand_idx = cand_idx[first]
        row = base[cand_idx] @ qm[qi]
        take = min(k, cand_idx.size)
        part = np.argpartition(-row, take - 1)[:take]
        out.append(
            pd.DataFrame(
                {
                    "query_id": qid,
                    "vec_id": vids[cand_idx[part]],
                    "cosine": row[part],
                }
            )
        )
    if not out:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "vec_id": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
    return pd.concat(out)


def _topk_window(local: DataFrame, k: int) -> DataFrame:
    """Global exact top-k per query from per-partition local top-k rows."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank")
        )
    )


def kmeans_centroids(
    sample: np.ndarray, n_cells: int, iters: int = 15
) -> np.ndarray:
    """Deterministic spherical k-means (cosine) on a sample matrix:
    k-means++ init from a fixed-seed generator, Lloyd iterations with
    normalized centroid means; empty cells keep their previous centroid.
    Returns (n_cells, dim) unit rows."""
    rng = np.random.default_rng(IVF_SEED)
    X = _normalize_rows(sample)
    n = X.shape[0]
    n_cells = min(n_cells, n)
    # k-means++ (distance = 1 - cosine)
    first = int(rng.integers(n))
    cents = [X[first]]
    d = 1.0 - X @ cents[0]
    for _ in range(1, n_cells):
        p = np.maximum(d, 0.0)
        tot = p.sum()
        if tot <= 0.0:
            idx = int(rng.integers(n))
        else:
            idx = int(rng.choice(n, p=p / tot))
        cents.append(X[idx])
        d = np.minimum(d, 1.0 - X @ cents[-1])
    C = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if members.shape[0]:
                C[c] = members.sum(axis=0)
        C = _normalize_rows(C)
    return C


def ivf_fit_centroids(
    emb: DataFrame, n_cells: int = 16, max_sample: int = 4096
) -> np.ndarray:
    """IVF coarse quantizer fit: deterministic sample (lowest vec_ids — at
    cluster scale swap for a seeded TABLESAMPLE; the fit only needs a
    representative few thousand rows), then driver-side spherical
    k-means. The centroid matrix is tiny (n_cells x dim) and ships to
    executors in the task closure."""
    pdf = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(int(max_sample))
        .toPandas()
    )
    return kmeans_centroids(np.stack(pdf["embedding"].to_numpy()), n_cells)


def ivf_assign(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment, one Arrow-batched
    matmul per batch. At scale, write the base table partitioned by this
    column so probes prune file groups."""
    C = _normalize_rows(centroids)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _normalize_rows(np.stack(pdf["embedding"].to_numpy()))
            cell = np.argmax(m @ C.T, axis=1).astype(np.int64)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values, "cell": cell})

    return emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id long, cell long"
    )


def ann_topk_ivf(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 50,
    n_cells: int = 16,
    n_probe: int = 8,
    n_assign: int = 3,
) -> DataFrame:
    """(query_id, vec_id, cosine, rank): approximate top-k cosine
    neighbors via an IVF coarse quantizer — each query scores only base
    vectors assigned to one of its ``n_probe`` nearest centroid cells.

    ``n_assign`` is base-side multi-assignment (the IVF "spill" trick):
    each base vector is visible in its ``n_assign`` nearest cells, which
    recovers the neighbors that straddle a cell boundary. The defaults
    are sized for the synthetic embeddings table, which is near-ISOTROPIC
    64-d data — the worst case for any partition-pruned ANN — and reach
    recall@5 >= 0.95 there while scanning ~90% (measured; on clustered
    corpora the same plan prunes hard — see tests). Tune per corpus:
    n_cells ~ sqrt(N), n_probe/n_assign down as cluster separation grows.

    One pass over the base table, no shuffle of embeddings: centroids and
    the query->cells probe map ride in the closure; cell assignment,
    probe masking, and the scoring matmul all happen per Arrow batch; the
    only shuffled rows are each partition's local top-k (exactly the
    brute-force plan's tail). At 100 TB, use ``ivf_write_partitioned`` +
    ``ann_topk_ivf_partitioned``: the same plan over a table partitioned
    by cell, where probes prune file groups instead of masking rows."""
    qids, qm = _collect_queries(emb, query_mod)
    kk = int(k)
    C = ivf_fit_centroids(emb, n_cells)
    n_probe = min(int(n_probe), C.shape[0])
    n_assign = min(int(n_assign), C.shape[0])
    # per query: its n_probe nearest centroids
    qc = qm @ C.T  # (nq, n_cells)
    probe = np.argpartition(-qc, n_probe - 1, axis=1)[:, :n_probe]
    probe_mask = np.zeros((len(qids), C.shape[0]), dtype=bool)
    for qi in range(len(qids)):
        probe_mask[qi, probe[qi]] = True

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = _normalize_rows(np.stack(pdf["embedding"].to_numpy()))
            vids = pdf["vec_id"].to_numpy()
            # C is already unit rows (kmeans_centroids normalizes)
            cells = _assign_cells(base, C, n_assign)
            yield _local_topk_frames(
                qids,
                qm,
                base,
                vids,
                kk,
                lambda qi: probe_mask[qi][cells].any(axis=1),
            )

    local = emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="query_id long, vec_id long, cosine double"
    )
    return _topk_window(local, kk)


def ivf_write_partitioned(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    n_assign: int = 3,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Write the embeddings table PARTITIONED BY its IVF cell — the 100-TB
    layout: each base vector is duplicated into its ``n_assign`` nearest
    cells (the multi-assign spill materialized on disk), so a probe that
    touches ``n_probe`` cells reads only those partition directories and
    the other files are never opened (partition pruning, asserted in
    tests/test_similarity.py). Returns the centroid matrix (persist it
    next to the table at scale; it is deterministic here — fixed seed —
    so recomputing from the same table reproduces it)."""
    C = centroids if centroids is not None else ivf_fit_centroids(emb, n_cells)
    Cn = _normalize_rows(C)
    n_assign = min(int(n_assign), Cn.shape[0])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _normalize_rows(np.stack(pdf["embedding"].to_numpy()))
            cells = _assign_cells(m, Cn, n_assign)
            idx = np.repeat(np.arange(len(pdf)), n_assign)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values[idx],
                    "embedding": pdf["embedding"].values[idx],
                    "ivf_cell": cells.reshape(-1),
                }
            )

    exploded = emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id long, embedding array<double>, ivf_cell long"
    )
    exploded.write.mode("overwrite").partitionBy("ivf_cell").parquet(path)
    return C


def ann_topk_ivf_partitioned(
    spark,
    path: str,
    centroids: np.ndarray,
    k: int = 5,
    query_mod: int = 50,
    n_probe: int = 8,
    queries: DataFrame | None = None,
) -> DataFrame:
    """IVF probe over the ``ivf_write_partitioned`` layout: the union of
    all queries' probe cells becomes a PARTITION FILTER on the scan (only
    the probed ``ivf_cell=...`` directories are read), then each query
    scores only the rows of its own probe cells. Returns exactly
    ``ann_topk_ivf``'s result for the same centroids/n_probe/n_assign
    (parity-tested): the on-disk spill layout replaces the in-kernel
    multi-assign, trading ``n_assign``x storage for file pruning.

    ``queries``: the (vec_id, embedding) source to draw the query set
    from. Pass the SOURCE embeddings table (or any small dedicated query
    table) so the partitioned store is only ever read with the partition
    filter — without it the query collection falls back to scanning
    every ``ivf_cell=`` directory of the store just to find ~N/query_mod
    vectors, which defeats the pruned-read shape at scale (the store's
    float64 copies of the float32 source values are bit-identical, so
    the result set is unchanged either way)."""
    Cn = _normalize_rows(centroids)
    base = spark.read.parquet(path)
    qsrc = (
        queries
        if queries is not None
        else base.dropDuplicates(["vec_id"])
    )
    qdf = (
        qsrc.filter(F.col("vec_id") % query_mod == 0)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .toPandas()
    )
    qids = qdf["vec_id"].to_numpy()
    qm = _normalize_rows(np.stack(qdf["embedding"].to_numpy()))
    kk = int(k)
    n_probe = min(int(n_probe), Cn.shape[0])
    qc = qm @ Cn.T
    probe = np.argpartition(-qc, n_probe - 1, axis=1)[:, :n_probe]
    probe_mask = np.zeros((len(qids), Cn.shape[0]), dtype=bool)
    for qi in range(len(qids)):
        probe_mask[qi, probe[qi]] = True
    probed_cells = sorted(int(c) for c in np.unique(probe))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _normalize_rows(np.stack(pdf["embedding"].to_numpy()))
            vids = pdf["vec_id"].to_numpy()
            cells = pdf["ivf_cell"].to_numpy().astype(np.int64)
            yield _local_topk_frames(
                qids, qm, m, vids, kk, lambda qi: probe_mask[qi][cells]
            )

    pruned = base.filter(F.col("ivf_cell").isin(probed_cells))
    local = pruned.select("vec_id", "embedding", "ivf_cell").mapInPandas(
        kernel, schema="query_id long, vec_id long, cosine double"
    )
    # spill copies WITHIN a batch are collapsed in-kernel (see
    # _local_topk_frames); copies split ACROSS batches score twice with
    # bit-identical cosine — collapse before the global top-k window
    return _topk_window(local.dropDuplicates(["query_id", "vec_id"]), kk)


def _hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((LSH_BITS, dim))


def hyperplane_signatures(emb: DataFrame, dim: int = 64) -> DataFrame:
    """(vec_id, sig): LSH_BITS-bit random-hyperplane signature."""
    h = _hyperplanes(dim)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (m @ h.T) > 0.0  # (n, LSH_BITS)
            sig = np.zeros(len(pdf), dtype=np.int64)
            for b in range(LSH_BITS):
                sig |= bits[:, b].astype(np.int64) << b
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values, "sig": sig})

    return emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id long, sig long"
    )


def neardup_lsh(emb: DataFrame, tau: float = 0.45, dim: int = 64) -> DataFrame:
    """(vec_id_1, vec_id_2, cosine): near-duplicate pairs with cosine >=
    tau, candidates from LSH band buckets (approximate recall; exact
    precision — every emitted pair is verified with a float64 cosine)."""
    # one row per (vec, band), tiny — materialize so the self-join's two
    # sides share one signature kernel pass instead of running it twice
    sigs = hyperplane_signatures(emb, dim)
    bands = sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("sig"), b * LSH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << LSH_BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("vec_id", "band.band_id", "band.band_val").localCheckpoint()
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_val"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id_1"), F.col("b.vec_id").alias("vec_id_2")
        )
        .distinct()
    )
    e1 = emb.select(
        F.col("vec_id").alias("vec_id_1"), F.col("embedding").alias("emb_1")
    )
    e2 = emb.select(
        F.col("vec_id").alias("vec_id_2"), F.col("embedding").alias("emb_2")
    )
    pairs = cand.join(e1, "vec_id_1").join(e2, "vec_id_2")

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = _normalize_rows(np.stack(pdf["emb_1"].to_numpy()))
            b = _normalize_rows(np.stack(pdf["emb_2"].to_numpy()))
            cos = np.sum(a * b, axis=1)
            keep = cos >= tau
            yield pd.DataFrame(
                {
                    "vec_id_1": pdf["vec_id_1"].values[keep],
                    "vec_id_2": pdf["vec_id_2"].values[keep],
                    "cosine": cos[keep],
                }
            )

    return pairs.mapInPandas(
        verify, schema="vec_id_1 long, vec_id_2 long, cosine double"
    )


def neardup_exact(emb: DataFrame, tau: float = 0.45) -> DataFrame:
    """Exact cosine-threshold pairs: one batched matmul pass of the base
    table against the (collected) full matrix — verification-scale only."""
    full = emb.select("vec_id", "embedding").orderBy("vec_id").toPandas()
    all_ids = full["vec_id"].to_numpy()
    all_m = _normalize_rows(np.stack(full["embedding"].to_numpy()))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            b = _normalize_rows(np.stack(pdf["embedding"].to_numpy()))
            vids = pdf["vec_id"].to_numpy()
            cos = b @ all_m.T
            rows_i, rows_j = np.nonzero(cos >= tau)
            keep = vids[rows_i] < all_ids[rows_j]
            yield pd.DataFrame(
                {
                    "vec_id_1": vids[rows_i][keep],
                    "vec_id_2": all_ids[rows_j][keep],
                    "cosine": cos[rows_i, rows_j][keep],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id_1 long, vec_id_2 long, cosine double"
    )
