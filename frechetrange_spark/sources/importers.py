"""S3 dataset importers — Spark-first re-expression of the reference's
``data/dataset2ssv.py`` (T-Drive/San-Francisco/GeoLife/character -> the
``x y id`` point table).

The reference assigns ``traj_id`` = index of the file in the sorted file
list and keeps points in file order (dataset2ssv.py:15-60). Order within a
file is only guaranteed if the file is read as ONE unit, so each file is
ingested wholetext (one row per file — files are the parallelism unit,
exactly how a 10^12-row ingest would shard) and split into lines with
posexplode; everything downstream is native Catalyst.

The character dataset ships smoothed derivatives; the importer integrates
them with a running sum (dataset2ssv.py:24 ``np.cumsum``) — here a window
sum, still no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _files_as_lines(
    spark: SparkSession, path: str, skip_lines: int = 0
) -> DataFrame:
    """(traj_id, seq, line): traj_id = rank of the file in sorted order
    (dataset2ssv.py sorted(fileset)), seq = line number after the header."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("fname"), F.col("value")
    )
    ranked = raw.withColumn(
        "traj_id", F.dense_rank().over(Window.orderBy("fname")) - 1
    )
    lines = ranked.select(
        "traj_id",
        F.posexplode(F.split(F.col("value"), "\r?\n")).alias("pos", "line"),
    ).filter(F.length(F.trim("line")) > 0)
    if skip_lines:
        lines = lines.filter(F.col("pos") >= skip_lines)
    return lines.withColumn(
        "seq",
        F.row_number().over(Window.partitionBy("traj_id").orderBy("pos")) - 1,
    ).select("traj_id", "seq", "line")


def _xy(lines: DataFrame, sep: str) -> DataFrame:
    toks = F.split(F.regexp_replace(F.trim("line"), sep, " "), " +")
    return lines.select(
        "traj_id",
        "seq",
        F.element_at(toks, 1).cast("double").alias("x"),
        F.element_at(toks, 2).cast("double").alias("y"),
    )


def sanfrancisco_points(spark: SparkSession, indir: str) -> DataFrame:
    """.plt files, space-separated, first two columns (dataset2ssv.py:28-40)."""
    return _xy(_files_as_lines(spark, indir), " +")


def geolife_points(spark: SparkSession, indir: str) -> DataFrame:
    """.plt files, 6 header lines, comma-separated (dataset2ssv.py:42-60)."""
    return _xy(_files_as_lines(spark, indir, skip_lines=6), ",")


def character_points(spark: SparkSession, indir: str) -> DataFrame:
    """Character dataset: space-separated smoothed derivatives, integrated
    to a spatial object with a running sum (dataset2ssv.py:13-25)."""
    d = _xy(_files_as_lines(spark, indir), " +")
    w = (
        Window.partitionBy("traj_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return d.select(
        "traj_id",
        "seq",
        F.sum("x").over(w).alias("x"),
        F.sum("y").over(w).alias("y"),
    )
