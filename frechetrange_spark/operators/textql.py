"""Text-analysis operators over the documents/web-pages corpus: token
stats, language identification, quality scoring, and winnowing-style
document fingerprints.

All four are pure Catalyst expression pipelines (split / higher-order
array functions / windows) — no UDFs — so they whole-stage-codegen and
scale linearly with input partitions. Each has a bit-exact ANSI-SQL oracle
(frechetrange_spark/oracles.py): integer token hashes, then double math in
a fixed operation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# deterministic marker sets for the language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "en": ["the", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "et", "les", "des", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def _toks(text_col: str = "text"):
    return F.filter(F.split(F.col(text_col), " "), lambda t: F.length(t) > 0)


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, n_alpha_tokens, n_num_tokens, avg_token_len)

    n_alpha/n_num approximate a BPE-ish pre-tokenization split: runs of
    letters vs runs of digits (the regex classes a byte-pair pre-tokenizer
    feeds)."""
    toks = _toks()
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.filter(toks, lambda t: t.rlike("^[a-zA-Z]+$")))
        .cast("long")
        .alias("n_alpha_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$")))
        .cast("long")
        .alias("n_num_tokens"),
        (F.length("text").cast("double") / F.size(toks).cast("double")).alias(
            "avg_token_len"
        ),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred) — marker-token counting heuristic. Argmax over
    per-language marker hits; ties broken by language code ascending;
    zero hits -> 'und'. Deterministic, SQL-replicable."""
    toks = _toks()
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang]))).alias(
            f"score_{lang}"
        )
        for lang in sorted(LANG_MARKERS)
    ]
    scored = docs.select("doc_id", *scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.lit("und")
    # first language (ascending) achieving the max wins — build the CASE
    # from the last to the first so earlier langs take precedence
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select("doc_id", pred.alias("lang_pred"))


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, uniq_ratio, stop_ratio, quality) — composite
    web-text quality heuristic (length, lexical diversity, stopword
    density, token shape), fixed double-op order for oracle parity."""
    toks = _toks()
    n_tok = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
    avg_len = F.length("text").cast("double") / n_tok
    uniq_ratio = uniq / n_tok
    stop_ratio = stop / n_tok
    quality = (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.3
        + uniq_ratio * 0.3
        + (1.0 - stop_ratio) * 0.2
        + F.least(avg_len / 8.0, F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


# token hash used by fingerprints / minhash / simhash — integer-only,
# identical in any SQL dialect: (len*31 + ascii(first)*7 + ascii(last)*13) % 1000003
def token_hash(tok) -> F.Column:
    return (
        (
            F.length(tok).cast("long") * 31
            + F.ascii(tok).cast("long") * 7
            + F.ascii(tok.substr(F.length(tok), F.lit(1))).cast("long") * 13
        )
        % 1000003
    ).cast("long")


def doc_fingerprints(docs: DataFrame, window: int = 4, mod: int = 16) -> DataFrame:
    """(doc_id, fp) — winnowing-style rolling fingerprints: polynomial hash
    of each ``window``-gram of token hashes, mod-sampled (fp % mod == 0),
    distinct per doc. A cheap near-dup / containment signal that needs only
    a window + a filter — no shuffle beyond the final distinct."""
    toks = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
        )
        .filter(F.length("tok") > 0)
        .select("doc_id", "pos", token_hash(F.col("tok")).alias("th"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    b = F.lit(131)
    fp = (
        ((F.lag("th", 3).over(w) * b + F.lag("th", 2).over(w)) * b + F.lag("th", 1).over(w))
        * b
        + F.col("th")
    )
    return (
        toks.withColumn("fp", fp)
        .filter(F.col("fp").isNotNull() & (F.col("fp") % mod == 0))
        .select("doc_id", "fp")
        .distinct()
    )
