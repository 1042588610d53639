"""ANSI-SQL (DuckDB-runnable) oracle statements for the driver's
correctness gate and for pytest cross-checks.

Each statement recomputes a Spark query's result from the same parquet
views (``documents``, ``embeddings``, ...) using only portable SQL. The
trajectory reconstruction is bit-exact: identical integer math followed by
the same IEEE double operations in the same order (window running sums).
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
SELECT traj_id, seq, x, y FROM origins
UNION ALL
SELECT traj_id, seq, x, y FROM walked
"""

# Per-trajectory derived data: MBR + endpoints + point count (SURVEY A1/K11).
CURVE_FEATURES_SQL = f"""
WITH pts AS ({POINTS_SQL})
SELECT traj_id,
       COUNT(*) AS n_points,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y,
       arg_min(x, seq) AS x_first, arg_min(y, seq) AS y_first,
       arg_max(x, seq) AS x_last,  arg_max(y, seq) AS y_last
FROM pts
GROUP BY traj_id
"""
