"""ANSI-SQL (DuckDB-runnable) oracle statements for the driver's
correctness gate and for pytest cross-checks.

Each statement recomputes a Spark query's result from the same parquet
views (``documents``, ``embeddings``, ...) using only portable SQL. The
trajectory reconstruction is bit-exact: identical integer math followed by
the same IEEE double operations in the same order (window running sums),
so joins/filters on the derived doubles agree exactly.
"""

# (traj_id, seq, x, y) — mirrors sources.trajectories.points_from_text.
POINTS_SQL = """
WITH splits AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), toks AS (
  SELECT doc_id, toks[i] AS tok, i AS ord
  FROM splits, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
  WHERE length(toks[i]) > 0
), numbered AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS seq
  FROM toks
), steps AS (
  SELECT doc_id, seq,
         ((length(tok)*31 + ascii(tok)) % 13 - 6)/4.0 AS dx,
         ((length(tok)*17 + ascii(tok)*7) % 11 - 5)/4.0 AS dy
  FROM numbered
), walked AS (
  SELECT doc_id AS traj_id, seq,
         (doc_id*37 % 1000)/10.0
           + SUM(dx) OVER (PARTITION BY doc_id ORDER BY seq
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x,
         (doc_id*73 % 1000)/10.0
           + SUM(dy) OVER (PARTITION BY doc_id ORDER BY seq
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y
  FROM steps
), origins AS (
  SELECT doc_id AS traj_id, 0 AS seq,
         CAST((doc_id*37 % 1000)/10.0 AS DOUBLE) AS x,
         CAST((doc_id*73 % 1000)/10.0 AS DOUBLE) AS y
  FROM documents
)
SELECT CAST(traj_id AS BIGINT) AS traj_id, CAST(seq AS BIGINT) AS seq, x, y
FROM (SELECT * FROM origins UNION ALL SELECT * FROM walked)
"""

# Per-trajectory derived data: MBR + endpoints + point count (SURVEY A1/K11,
# grid.hpp:173-190, bb/spatial_index.hpp:228-242).
CURVE_FEATURES_SQL = f"""
WITH pts AS ({POINTS_SQL})
SELECT traj_id,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y,
       arg_min(x, seq) AS x_first, arg_min(y, seq) AS y_first,
       arg_max(x, seq) AS x_last,  arg_max(y, seq) AS y_last
FROM pts
GROUP BY traj_id
"""

# Home-cell assignment, corner = (min_x, min_y), mesh = 15
# (grid.hpp:352-358 floor-division semantics).
GRID_CELLS_SQL = f"""
WITH feats AS ({CURVE_FEATURES_SQL})
SELECT traj_id,
       CAST(floor(min_x/15.0) AS BIGINT) AS cell_x,
       CAST(floor(min_y/15.0) AS BIGINT) AS cell_y
FROM feats
"""

# J1 candidate pairs: 3x3 neighbor-cell equi-join + F2 MBR-border filter +
# F1 endpoint filter; eps = 15, mesh = 15, corner = min_min, queries =
# traj_id % 50 == 0 (grid.hpp:462-553, 683-717; dv/frechet_distance.hpp:44-47).
GRID_CANDIDATES_SQL = f"""
WITH feats AS ({CURVE_FEATURES_SQL}),
q AS (SELECT * FROM feats WHERE traj_id % 50 = 0),
offs AS (SELECT dxo.o AS dx, dyo.o AS dy
         FROM (VALUES (-1),(0),(1)) dxo(o), (VALUES (-1),(0),(1)) dyo(o)),
qcells AS (
  SELECT q.*,
         CAST(floor(q.min_x/15.0) AS BIGINT) + offs.dx AS cell_x,
         CAST(floor(q.min_y/15.0) AS BIGINT) + offs.dy AS cell_y
  FROM q, offs
  WHERE q.min_x - 15.0 < (floor(q.min_x/15.0) + offs.dx + 1) * 15.0
    AND q.min_x + 15.0 >= (floor(q.min_x/15.0) + offs.dx) * 15.0
    AND q.min_y - 15.0 < (floor(q.min_y/15.0) + offs.dy + 1) * 15.0
    AND q.min_y + 15.0 >= (floor(q.min_y/15.0) + offs.dy) * 15.0
),
d AS (
  SELECT feats.*,
         CAST(floor(min_x/15.0) AS BIGINT) AS cell_x,
         CAST(floor(min_y/15.0) AS BIGINT) AS cell_y
  FROM feats
)
SELECT qc.traj_id AS query_id, d.traj_id AS traj_id
FROM qcells qc JOIN d ON qc.cell_x = d.cell_x AND qc.cell_y = d.cell_y
WHERE abs(qc.min_x - d.min_x) <= 15.0 AND abs(qc.max_x - d.max_x) <= 15.0
  AND abs(qc.min_y - d.min_y) <= 15.0 AND abs(qc.max_y - d.max_y) <= 15.0
  AND (qc.x_first - d.x_first)*(qc.x_first - d.x_first)
      + (qc.y_first - d.y_first)*(qc.y_first - d.y_first) <= 225.0
  AND (qc.x_last - d.x_last)*(qc.x_last - d.x_last)
      + (qc.y_last - d.y_last)*(qc.y_last - d.y_last) <= 225.0
"""

# J3 di-hash-style endpoint candidates: start AND end strictly within eps
# (bddm/spatial_hash.hpp:470-494, strict < per :484-486); eps = 15,
# queries = traj_id % 50 == 0.
ENDPOINT_CANDIDATES_SQL = f"""
WITH feats AS ({CURVE_FEATURES_SQL}),
q AS (SELECT * FROM feats WHERE traj_id % 50 = 0)
SELECT q.traj_id AS query_id, d.traj_id AS traj_id
FROM q JOIN feats d
  ON (q.x_first - d.x_first)*(q.x_first - d.x_first)
     + (q.y_first - d.y_first)*(q.y_first - d.y_first) < 225.0
 AND (q.x_last - d.x_last)*(q.x_last - d.x_last)
     + (q.y_last - d.y_last)*(q.y_last - d.y_last) < 225.0
"""
