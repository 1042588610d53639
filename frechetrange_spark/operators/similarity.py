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
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


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
    ).select("vec_id", "band.band_id", "band.band_val")
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
