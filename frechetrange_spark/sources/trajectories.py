"""Deterministic trajectory reconstruction from the web-pages table, plus
the reference's SSV point-table format.

Data model (SURVEY.md §1): a trajectory is an ordered sequence of 2-D
double points; on disk it is a flat point table ``(traj_id, seq, x, y)``
(the reference's ``x y id`` SSV, data/sanfrancisco.ssv:1); in kernels it is
one ``(n,2)`` float64 ndarray per curve.

Reconstruction rule (the deterministic per-url mapping required by the
north rule): each document's token stream drives a walk —

- origin: ``x0 = (doc_id*37 % 1000)/10``, ``y0 = (doc_id*73 % 1000)/10``
- step k (1-indexed over non-empty whitespace-split tokens, L = token
  length, A = ascii code of its first char)::

      dx_k = ((L*31 + A)   % 13 - 6) / 4.0
      dy_k = ((L*17 + A*7) % 11 - 5) / 4.0

- point k = origin + running sum of steps 1..k.

Every operation is integer arithmetic followed by the same IEEE double
ops in the same order on any engine, so the table is reproducible
bit-for-bit in ANSI SQL (the DuckDB oracle in ``__spark_entry__.py`` does
exactly that). The whole reconstruction is native Catalyst — split /
posexplode / window running sum — no Python in the path, so it scales to
the 10^12-row carrier table by partitioning on doc_id alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frechetrange_spark.sources.webpages import extract_text, webpages


def _origin_x(doc_id: Column) -> Column:
    return (doc_id * 37 % 1000) / 10.0


def _origin_y(doc_id: Column) -> Column:
    return (doc_id * 73 % 1000) / 10.0


def points_from_text(df, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Reconstruct the flat point table (traj_id, seq, x, y) from any
    DataFrame carrying (id_col, text_col). Pure Catalyst ops.

    One-exchange plan (r06): the origin is injected as a NULL marker
    element prepended to the (pre-filtered) token array before the
    posexplode, so the explode ordinal IS the seq (origin at 0 — no
    row_number window) and there is no separate origins branch to union
    (the old two-branch plan forced a second full exchange of the point
    table into the downstream groupBy; now the running-sum window's
    exchange is the only one and grouping by traj_id reuses it). Values
    are bit-identical: the marker contributes dx = dy = 0.0, every step
    is an exact multiple of 0.25 so the running sums are exact, and
    ``origin + 0.0 == origin``."""
    toks_arr = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: F.length(t) > 0,
    )
    marked = F.concat(F.array(F.lit(None).cast("string")), toks_arr)
    toks = df.select(
        F.col(id_col).alias("traj_id"),
        F.posexplode(marked).alias("seq", "tok"),
    )
    ln = F.length("tok")
    a0 = F.ascii("tok")
    steps = toks.select(
        "traj_id",
        "seq",
        F.coalesce((((ln * 31 + a0) % 13 - 6) / 4.0), F.lit(0.0)).alias("dx"),
        F.coalesce((((ln * 17 + a0 * 7) % 11 - 5) / 4.0), F.lit(0.0)).alias("dy"),
    )
    w = (
        Window.partitionBy("traj_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return steps.select(
        "traj_id",
        "seq",
        (_origin_x(F.col("traj_id")) + F.sum("dx").over(w)).alias("x"),
        (_origin_y(F.col("traj_id")) + F.sum("dy").over(w)).alias("y"),
    )


def trajectory_points(
    spark: SparkSession, sf_dir: str, via_html: bool = False
) -> DataFrame:
    """Point table for the corpus at ``sf_dir``.

    ``via_html=True`` runs the real carrier path: html -> extract_text
    (pandas UDF, byte-identical) -> reconstruction. The default goes from
    the stored text directly (same bytes by the extraction invariant),
    keeping the whole plan UDF-free.
    """
    pages = webpages(spark, sf_dir)
    if via_html:
        pages = pages.withColumn("text", extract_text("html"))
    return points_from_text(pages, id_col="doc_id", text_col="text")


# ---------------------------------------------------------------------------
# Curve assembly: point table -> one row per trajectory with array columns
# and the per-curve derived data every index/filter needs (SURVEY §2.4 A1,
# §2.6 K11).
# ---------------------------------------------------------------------------

def assemble_curves(points: DataFrame, drop_consecutive_dups: bool = False) -> DataFrame:
    """Group the point table into curves:

    (traj_id, xs: array<double>, ys: array<double>, n_points,
     x_first, y_first, x_last, y_last, min_x, max_x, min_y, max_y)

    The min/max columns are the MBR (reference detail/dv/grid.hpp:173-190);
    first/last + MBR form the bb 8-d signature
    (detail/bb/spatial_index.hpp:228-242). ``drop_consecutive_dups``
    replicates bddm's duplicate-point filter
    (detail/bddm/spatial_hash.hpp:219-229) — Fréchet-invariant.
    """
    pts = F.array_sort(F.collect_list(F.struct("seq", "x", "y")))
    curves = points.groupBy("traj_id").agg(
        pts.alias("_pts"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )
    if drop_consecutive_dups:
        # keep point i if i==0 or point differs from its predecessor
        curves = curves.withColumn(
            "_pts",
            F.filter(
                "_pts",
                lambda s, i: (i == 0)
                | (s["x"] != F.get("_pts", i - 1)["x"])
                | (s["y"] != F.get("_pts", i - 1)["y"]),
            ),
        )
    return curves.select(
        "traj_id",
        F.transform("_pts", lambda s: s["x"]).alias("xs"),
        F.transform("_pts", lambda s: s["y"]).alias("ys"),
        F.size("_pts").alias("n_points"),
        F.element_at("_pts", 1)["x"].alias("x_first"),
        F.element_at("_pts", 1)["y"].alias("y_first"),
        F.element_at("_pts", -1)["x"].alias("x_last"),
        F.element_at("_pts", -1)["y"].alias("y_last"),
        "min_x",
        "max_x",
        "min_y",
        "max_y",
    )


def curves(spark: SparkSession, sf_dir: str, via_html: bool = False) -> DataFrame:
    return assemble_curves(trajectory_points(spark, sf_dir, via_html=via_html))


# ---------------------------------------------------------------------------
# SSV interop (the reference's on-disk format, data/sanfrancisco.ssv)
# ---------------------------------------------------------------------------

def read_ssv(
    spark: SparkSession, path: str, nan_separated: bool = False
) -> DataFrame:
    """Read a reference-format SSV point table (``x y id`` header,
    space-separated) into (traj_id, seq, x, y); seq = file order per id.

    ``nan_separated=True`` reads the R-package variant instead: trajectory
    boundaries are NaN separator rows and ids are assigned by split order
    (r-package/dv.R ``getTrajectoryIDs``/``tsplit`` — NaN rows are data
    delimiters, not points; cf. the bddm NaN drop,
    detail/bddm/spatial_hash.hpp:219-229). Ids come from a global prefix
    count of separator rows, computed DISTRIBUTED as a two-level scan:
    a partition-local running count (window partitioned by input split)
    plus per-split offsets from a tiny #splits-row aggregate — no
    single-task global window. Relies on the same file-order invariant
    the point order already uses: within one input file, Spark's CSV
    splits cover increasing byte ranges, so ordering by
    ``monotonically_increasing_id`` equals file order."""
    raw = (
        spark.read.option("sep", " ")
        .option("header", "true")
        .schema("x double, y double, id double")
        .csv(path)
        .withColumn("_file_pos", F.monotonically_increasing_id())
    )
    if nan_separated:
        is_sep = F.isnan("x") | F.isnan("y")
        sep01 = F.when(is_sep, 1).otherwise(0)
        raw = raw.withColumn("_split", F.spark_partition_id())
        wp = (
            Window.partitionBy("_split")
            .orderBy("_file_pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        local = raw.withColumn("_local_cum", F.sum(sep01).over(wp))
        totals = raw.groupBy("_split").agg(
            F.sum(sep01).alias("_cnt"), F.min("_file_pos").alias("_ord")
        )
        # global window over #splits rows only (driver-scale, not data-scale)
        wo = Window.orderBy("_ord").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = totals.select(
            "_split", F.coalesce(F.sum("_cnt").over(wo), F.lit(0)).alias("_off")
        )
        numbered = (
            local.join(F.broadcast(offsets), "_split")
            .withColumn(
                "traj_id", (F.col("_local_cum") + F.col("_off")).cast("long")
            )
            .filter(~is_sep)
        )
        return numbered.select(
            "traj_id",
            (
                F.row_number().over(
                    Window.partitionBy("traj_id").orderBy("_file_pos")
                )
                - 1
            ).alias("seq"),
            "x",
            "y",
        )
    return raw.select(
        F.col("id").cast("long").alias("traj_id"),
        (
            F.row_number().over(
                Window.partitionBy("id").orderBy("_file_pos")
            )
            - 1
        ).alias("seq"),
        "x",
        "y",
    )


def write_ssv(points: DataFrame, path: str) -> None:
    """Write a point table back to reference SSV layout (x y id)."""
    (
        points.orderBy("traj_id", "seq")
        .select("x", "y", F.col("traj_id").alias("id"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", " ")
        .option("header", "true")
        .csv(path)
    )
