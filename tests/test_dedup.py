"""Dedup operator properties beyond the driver's oracle gate: SimHash
banding losslessness and scale behavior, and the Jaccard candidate path.

The SimHash layout is 64 bits in 8 bands of 8 (operators/dedup.py): the
band join is lossless for hamming <= 7 (pigeonhole), and the 256-value
band space keeps bucket sizes proportional to true duplicate clusters on
a skewed corpus — the property a 20-bit/4x5 layout lacks (its 32-value
bands collect ~N/32 docs each and degenerate toward all-pairs at scale).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frechetrange_spark.operators.dedup import (
    SIM_BANDS,
    SIM_BAND_BITS,
    SIM_MAX_HAMMING,
    SIMHASH_BITS,
    jaccard_pairs,
    minhash_lsh_dedup,
    simhash,
    simhash_pairs,
)

VOCAB = [
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    "kilo lima mike november oscar papa quebec romeo sierra tango",
    "uniform victor whiskey xray yankee zulu one two three four",
]


def _skewed_docs(spark, cluster: int = 40, tail: int = 160):
    """Deterministic skewed corpus: ``cluster`` near-identical docs (one
    token swapped per variant) + ``tail`` diverse docs."""
    base = (VOCAB[0] + " " + VOCAB[1]) * 2
    rows = []
    for i in range(cluster):
        toks = base.split(" ")
        toks[i % len(toks)] = f"tok{i}"
        rows.append((i, " ".join(toks)))
    for j in range(tail):
        words = [
            VOCAB[(j + k) % 3].split(" ")[(j * 7 + k * 3) % 10]
            + str((j * 13 + k) % 97)
            for k in range(30)
        ]
        rows.append((cluster + j, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _u64(v: int) -> int:
    return v & ((1 << 64) - 1)


def test_simhash_band_join_is_lossless(spark):
    """The 8x8 band join returns EXACTLY the all-pairs hamming<=7 answer."""
    docs = _skewed_docs(spark)
    s = simhash(docs).toPandas()
    sims = dict(zip(s["doc_id"], s["sim"]))
    ids = sorted(sims)
    expected = set()
    for ii, a in enumerate(ids):
        for b in ids[ii + 1 :]:
            if (_u64(int(sims[a])) ^ _u64(int(sims[b]))).bit_count() <= SIM_MAX_HAMMING:
                expected.add((a, b))
    got = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in simhash_pairs(docs).collect()
    }
    assert got == expected
    # the near-dup cluster must actually be found
    assert sum(1 for a, b in got if a < 40 and b < 40) > 0


def test_band_buckets_track_clusters_not_corpus_size(spark):
    """On a skewed corpus the 8-bit bands keep the max bucket near the true
    duplicate-cluster size, while a 5-bit layout over the same signatures
    (the old 20-bit geometry) produces buckets that scale with N/32."""
    cluster, tail = 40, 600
    docs = _skewed_docs(spark, cluster, tail)
    s = simhash(docs).toPandas()
    # the discriminating population is the DIVERSE tail (no true near-dups):
    # bucket mass there is pure banding collision, the all-pairs driver
    tail_mask = s["doc_id"].to_numpy() >= cluster
    vals = np.array(
        [_u64(int(v)) for v in s["sim"][tail_mask]], dtype=np.uint64
    )

    def max_bucket(band_bits: int, n_bands: int) -> int:
        mx = 0
        for k in range(n_bands):
            bandvals = (vals >> np.uint64(k * band_bits)) & np.uint64(
                (1 << band_bits) - 1
            )
            _, counts = np.unique(bandvals, return_counts=True)
            mx = max(mx, int(counts.max()))
        return mx

    assert SIMHASH_BITS == 64 and SIM_BANDS == 8 and SIM_BAND_BITS == 8
    wide = max_bucket(8, 8)
    narrow = max_bucket(5, 4)  # the old 20-bit/4x5 geometry, low 20 bits
    # 5-bit bands collect ~tail/32 docs per bucket; 8-bit bands stay sparse
    assert narrow >= tail // 32
    assert wide * 2 <= narrow


def test_simhash_pairs_rejects_above_band_bound(spark):
    docs = _skewed_docs(spark, 8, 16)
    with pytest.raises(AssertionError):
        simhash_pairs(docs, max_hamming=SIM_BANDS)


# ---------------------------------------------------------------------------
# Jaccard: verify path (per-candidate scoring) and the DF cap
# ---------------------------------------------------------------------------


def _pairs(df):
    return {
        (r["doc_id_1"], r["doc_id_2"], round(r["jaccard"], 12))
        for r in df.collect()
    }


def test_jaccard_verify_path_equals_standalone(spark):
    """Scoring candidate pairs directly (no shingle self-join) returns the
    same jaccard values the standalone path computes for those pairs —
    including on a corpus with a hot stop-shingle shared by every doc."""
    docs = _skewed_docs(spark, 20, 40)
    # inject a stop-shingle: the same 3-token prefix on every document
    docs = docs.select(
        "doc_id", F.concat(F.lit("the quick fox "), F.col("text")).alias("text")
    )
    standalone = jaccard_pairs(docs, 0.2)
    want = _pairs(standalone)
    cand = standalone.select("doc_id_1", "doc_id_2")
    got = _pairs(jaccard_pairs(docs, 0.2, candidates=cand))
    assert got == want


def test_jaccard_verify_path_has_no_shingle_self_join(spark):
    """The verify plan restricts both shingle sides with candidate-id
    semi-joins before any shingle equi-join runs."""
    docs = _skewed_docs(spark, 10, 10)
    cand = spark.createDataFrame(
        [(0, 1), (2, 3)], "doc_id_1 long, doc_id_2 long"
    )
    plan = jaccard_pairs(docs, 0.1, candidates=cand)._jdf.queryExecution().toString()
    assert "LeftSemi" in plan


def test_jaccard_df_cap_is_identity_when_loose(spark):
    """max_df >= the corpus's true max shingle DF changes nothing."""
    docs = _skewed_docs(spark, 15, 30)
    n = docs.count()
    assert _pairs(jaccard_pairs(docs, 0.3, max_df=n)) == _pairs(
        jaccard_pairs(docs, 0.3)
    )


def test_jaccard_df_cap_drops_stop_shingles(spark):
    """With a tight cap, pairs related ONLY through a universal stop-
    shingle disappear while true near-dups survive."""
    rows = [(i, "aa bb cc " + " ".join(f"w{i}x{k}" for k in range(20))) for i in range(12)]
    rows += [(100, "aa bb cc dd ee ff gg hh"), (101, "aa bb cc dd ee ff gg hh")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = _pairs(jaccard_pairs(docs, 0.05))
    capped = _pairs(jaccard_pairs(docs, 0.05, max_df=4))
    # the exact-dup pair survives the cap at full score
    assert any(a == 100 and b == 101 and j == 1.0 for a, b, j in capped)
    # stop-shingle-only relations are gone
    assert len(capped) < len(uncapped)


def test_jaccard_cap_bounds_hot_shingle_join_rows(spark):
    """On a hot-shingle corpus the DF cap bounds the shingle self-join's
    output: every doc shares the 'aa bb cc dd' stop-shingles, so uncapped
    the join emits ~k^2 rows per hot shingle; capped at max_df the output
    is provably <= max_df * |capped shingle rows| (each shingle row meets
    at most max_df partners)."""
    from frechetrange_spark.operators.dedup import shingle_sets

    k = 30
    rows = [
        (i, "aa bb cc dd " + " ".join(f"w{i}x{j}" for j in range(10)))
        for i in range(k)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    max_df = 4

    def join_rows(sh):
        a = sh.select(F.col("doc_id").alias("d1"), "sh")
        b = sh.select(F.col("doc_id").alias("d2"), "sh")
        return a.join(b, "sh").filter(F.col("d1") < F.col("d2")).count()

    sh = shingle_sets(docs)
    keep = (
        sh.groupBy("sh").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df).select("sh")
    )
    capped = sh.join(keep, "sh", "left_semi")
    uncapped_rows = join_rows(sh)
    capped_rows = join_rows(capped)
    # hot shingles drive ~k^2/2 rows uncapped; the cap removes them all
    assert uncapped_rows >= k * (k - 1) // 2
    assert capped_rows <= max_df * capped.count()
    assert capped_rows < uncapped_rows


def test_graded_jaccard_entry_has_cap_active(spark, tmp_path):
    """The driver-graded jaccard_pairs entry runs the CAPPED standalone
    plan: its plan carries the DF-cap left-semi join (round-2 verdict:
    the scale-killer was the entry wiring, not the operator)."""
    import __spark_entry__ as entry_mod

    docs = _skewed_docs(spark, 10, 20)
    sf_dir = str(tmp_path / "sf")
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    df = entry_mod.queries()["jaccard_pairs"](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "LeftSemi" in plan


def test_minhash_lsh_still_verifies_exactly(spark):
    """The LSH pipeline (bands -> candidates -> direct verify) returns
    pairs whose jaccard equals the standalone computation."""
    docs = _skewed_docs(spark, 20, 40)
    got = _pairs(minhash_lsh_dedup(docs, 0.5))
    full = _pairs(jaccard_pairs(docs, 0.5))
    # LSH may miss pairs (recall < 1) but never invents or mis-scores
    assert got <= full
