"""Point-in-polygon, raster/vector, and hierarchical tiling invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frechetrange_spark.operators.polygon import (
    FIXED_POLYGONS,
    point_in_polygon,
    polygons_df,
)
from frechetrange_spark.operators.raster import (
    rasterize_points,
    tile_pyramid,
    vectorize_cells,
)
from frechetrange_spark.operators.tiling import hier_cell, morton_key
from frechetrange_spark.sources.trajectories import trajectory_points
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def points(spark):
    p = trajectory_points(spark, SF_SMALL).cache()
    p.count()
    return p


def _pip_numpy(px, py, verts):
    inside = False
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def test_point_in_polygon_matches_numpy(spark, points):
    got = {
        (r["traj_id"], r["seq"], r["poly_id"])
        for r in point_in_polygon(points, polygons_df(spark)).collect()
    }
    pdf = points.toPandas()
    want = set()
    for pid, verts in FIXED_POLYGONS.items():
        for t, s, x, y in zip(pdf["traj_id"], pdf["seq"], pdf["x"], pdf["y"]):
            if _pip_numpy(x, y, verts):
                want.add((t, s, pid))
    assert got == want
    assert len(got) > 0


def test_rasterize_conserves_points(spark, points):
    total = points.count()
    for level in (0, 2):
        r = rasterize_points(points, 16.0, level)
        assert r.agg(F.sum("n_points")).collect()[0][0] == total


def test_tile_pyramid_parent_child(spark, points):
    pyr = tile_pyramid(points, 16.0, 3).toPandas()
    total = points.count()
    for lvl, sub in pyr.groupby("level"):
        assert sub["n_points"].sum() == total
    # every level-3 cell's parent at level 2 aggregates its children
    l3 = pyr[pyr["level"] == 3]
    l2 = pyr[pyr["level"] == 2].set_index(["cell_x", "cell_y"])["n_points"]
    rolled = l3.assign(
        px=np.floor(l3["cell_x"] / 2).astype(int),
        py=np.floor(l3["cell_y"] / 2).astype(int),
    ).groupby(["px", "py"])["n_points"].sum()
    assert rolled.sort_index().equals(l2.sort_index())


def test_vectorize_boxes_contain_their_points(spark, points):
    r = rasterize_points(points, 16.0, 2)
    v = vectorize_cells(r, 16.0, 2)
    joined = (
        points.withColumn("cell_x", F.floor(F.col("x") / 4.0).cast("long"))
        .withColumn("cell_y", F.floor(F.col("y") / 4.0).cast("long"))
        .join(v, ["cell_x", "cell_y"])
    )
    bad = joined.filter(
        (F.col("x") < F.col("min_x"))
        | (F.col("x") >= F.col("max_x"))
        | (F.col("y") < F.col("min_y"))
        | (F.col("y") >= F.col("max_y"))
    ).count()
    assert bad == 0


def test_hier_cell_prefix_property(spark, points):
    child = points.select(
        hier_cell(F.col("x"), F.col("y"), 16.0, 3)[0].alias("cx3"),
        hier_cell(F.col("x"), F.col("y"), 16.0, 3)[1].alias("cy3"),
        hier_cell(F.col("x"), F.col("y"), 16.0, 2)[0].alias("cx2"),
        hier_cell(F.col("x"), F.col("y"), 16.0, 2)[1].alias("cy2"),
    )
    bad = child.filter(
        (F.floor(F.col("cx3") / 2.0) != F.col("cx2"))
        | (F.floor(F.col("cy3") / 2.0) != F.col("cy2"))
    ).count()
    assert bad == 0


def test_morton_key_locality_and_uniqueness(spark, points):
    cells = points.select(
        F.floor(F.col("x") / 4.0).cast("long").alias("cx"),
        F.floor(F.col("y") / 4.0).cast("long").alias("cy"),
    ).distinct()
    keyed = cells.withColumn("mk", morton_key(F.col("cx"), F.col("cy")))
    assert keyed.count() == keyed.select("mk").distinct().count()
