"""Raster <-> vector tile operators over the hierarchical grid (the
H3/S2-style stand-in, SURVEY §2.3 note / §7.6).

- ``rasterize_points``: point table -> per-cell counts at a resolution
  level (mesh halves per level).
- ``tile_pyramid``: counts at EVERY level 0..L, built by rolling the
  finest level up through parent cells (``floor(child/2)``) — one scan of
  the points, then L tiny aggregations; the floor-division composition
  ``floor(x/2m) == floor(floor(x/m)/2)`` makes the rollup exact (the SQL
  oracle recomputes every level directly from the points, so the gate
  proves the invariant).
- ``vectorize_cells``: raster cells -> vector boxes (cell geometry), the
  inverse mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frechetrange_spark.operators.tiling import cell_coord


def _level_mesh(base_mesh: float, level: int) -> float:
    return float(base_mesh) / (2**level)


def rasterize_points(
    points: DataFrame, base_mesh: float = 16.0, level: int = 0
) -> DataFrame:
    """(cell_x, cell_y, n_points) at the given resolution level."""
    mesh = _level_mesh(base_mesh, level)
    return (
        points.select(
            cell_coord(F.col("x"), mesh).alias("cell_x"),
            cell_coord(F.col("y"), mesh).alias("cell_y"),
        )
        .groupBy("cell_x", "cell_y")
        .agg(F.count("*").cast("long").alias("n_points"))
    )


def tile_pyramid(
    points: DataFrame, base_mesh: float = 16.0, max_level: int = 3
) -> DataFrame:
    """(level, cell_x, cell_y, n_points) for levels 0..max_level, built by
    parent rollup from the finest level (one scan of the input)."""
    # Eagerly materialize the finest level: every coarser level and the
    # final union branch from it, so without the cut the POINT TABLE
    # (reconstruction + rasterize exchange) would be recomputed once per
    # union branch — 4x the dominant cost at max_level=3. The finest cell
    # table itself is tiny (one row per occupied cell), so the
    # localCheckpoint is one cheap job and its blocks die with the frame.
    finest = (
        rasterize_points(points, base_mesh, max_level)
        .withColumn("level", F.lit(max_level).cast("long"))
        .localCheckpoint()
    )
    levels = [finest]
    cur = finest
    for lvl in range(max_level - 1, -1, -1):
        cur = (
            cur.select(
                F.floor(F.col("cell_x") / 2.0).cast("long").alias("cell_x"),
                F.floor(F.col("cell_y") / 2.0).cast("long").alias("cell_y"),
                "n_points",
            )
            .groupBy("cell_x", "cell_y")
            .agg(F.sum("n_points").cast("long").alias("n_points"))
            .withColumn("level", F.lit(lvl).cast("long"))
        )
        levels.append(cur)
    out = levels[0]
    for df in levels[1:]:
        out = out.unionByName(df)
    return out.select("level", "cell_x", "cell_y", "n_points")


def vectorize_cells(
    raster: DataFrame, base_mesh: float = 16.0, level: int = 0
) -> DataFrame:
    """Raster -> vector: cell boxes with their counts."""
    mesh = _level_mesh(base_mesh, level)
    m = F.lit(mesh)
    return raster.select(
        "cell_x",
        "cell_y",
        (F.col("cell_x") * m).alias("min_x"),
        (F.col("cell_y") * m).alias("min_y"),
        ((F.col("cell_x") + 1) * m).alias("max_x"),
        ((F.col("cell_y") + 1) * m).alias("max_y"),
        "n_points",
    )
