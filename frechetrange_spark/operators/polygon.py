"""Point-in-polygon join (north-rule extension).

Filter-and-refine, same shape as the Fréchet join: polygons are covered by
grid tiles (their bbox cells), points carry their cell id, candidates meet
on a cell equi-join (polygon side broadcast — it is the small dimension),
and the exact even-odd ray-cast runs as a native higher-order array
expression (no UDF): count edges whose half-open y-span contains the
point's y and whose x-intersection lies right of the point.

Uses the half-open crossing rule ((y1 > py) != (y2 > py)), the standard
robust form: vertices on the ray count once, horizontal edges never.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frechetrange_spark.operators.tiling import cell_coord

# fixed demo polygon set (shared with the SQL oracle)
FIXED_POLYGONS: dict[int, list[tuple[float, float]]] = {
    1: [(10.0, 10.0), (60.0, 10.0), (60.0, 60.0), (10.0, 60.0)],  # square
    2: [(50.0, 50.0), (90.0, 50.0), (70.0, 90.0)],  # triangle
    3: [  # concave L
        (20.0, 20.0),
        (80.0, 20.0),
        (80.0, 40.0),
        (40.0, 40.0),
        (40.0, 80.0),
        (20.0, 80.0),
    ],
}


def polygon_edges(poly: list[tuple[float, float]]):
    n = len(poly)
    return [(poly[i], poly[(i + 1) % n]) for i in range(n)]


def polygons_df(spark: SparkSession, polys: dict | None = None) -> DataFrame:
    """(poly_id, edges: array<struct<x1,y1,x2,y2>>, bbox cols)."""
    polys = polys or FIXED_POLYGONS
    rows = []
    for pid, verts in polys.items():
        edges = [
            {"x1": a[0], "y1": a[1], "x2": b[0], "y2": b[1]}
            for a, b in polygon_edges(verts)
        ]
        xs = [v[0] for v in verts]
        ys = [v[1] for v in verts]
        rows.append((pid, edges, min(xs), max(xs), min(ys), max(ys)))
    return spark.createDataFrame(
        rows,
        "poly_id long, edges array<struct<x1:double,y1:double,x2:double,y2:double>>, "
        "p_min_x double, p_max_x double, p_min_y double, p_max_y double",
    )


def _tile_cover(polys: DataFrame, mesh: float) -> DataFrame:
    """Explode each polygon's bbox into the grid cells it covers."""
    return (
        polys.withColumn(
            "cell_x",
            F.explode(
                F.sequence(
                    cell_coord(F.col("p_min_x"), mesh),
                    cell_coord(F.col("p_max_x"), mesh),
                )
            ),
        )
        .withColumn(
            "cell_y",
            F.explode(
                F.sequence(
                    cell_coord(F.col("p_min_y"), mesh),
                    cell_coord(F.col("p_max_y"), mesh),
                )
            ),
        )
    )


def point_in_polygon(
    points: DataFrame, polys: DataFrame, mesh: float = 15.0
) -> DataFrame:
    """(traj_id, seq, poly_id) for every point strictly inside a polygon
    (even-odd rule). ``points`` needs (traj_id, seq, x, y)."""
    cover = _tile_cover(polys, mesh)
    pts = points.withColumn("cell_x", cell_coord(F.col("x"), mesh)).withColumn(
        "cell_y", cell_coord(F.col("y"), mesh)
    )
    cand = pts.join(F.broadcast(cover), ["cell_x", "cell_y"])
    crossings = F.size(
        F.filter(
            "edges",
            lambda e: ((e["y1"] > F.col("y")) != (e["y2"] > F.col("y")))
            & (
                F.col("x")
                < (e["x2"] - e["x1"])
                * (F.col("y") - e["y1"])
                / (e["y2"] - e["y1"])
                + e["x1"]
            ),
        )
    )
    return cand.filter(crossings % 2 == 1).select("traj_id", "seq", "poly_id")
