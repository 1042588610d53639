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

# A4/A5: the Σ(bucket size²) cell-crowding cost per candidate MBR corner
# (grid.hpp:334, 394-397, 410-432) — the statistic choose_corner argmins
# over; mesh = 15.
GRID_CORNER_SQL = f"""
WITH feats AS ({CURVE_FEATURES_SQL}),
assigned AS (
  SELECT 'min_min' AS corner,
         CAST(floor(min_x/15.0) AS BIGINT) AS cx,
         CAST(floor(min_y/15.0) AS BIGINT) AS cy FROM feats
  UNION ALL
  SELECT 'min_max', CAST(floor(min_x/15.0) AS BIGINT),
         CAST(floor(max_y/15.0) AS BIGINT) FROM feats
  UNION ALL
  SELECT 'max_min', CAST(floor(max_x/15.0) AS BIGINT),
         CAST(floor(min_y/15.0) AS BIGINT) FROM feats
  UNION ALL
  SELECT 'max_max', CAST(floor(max_x/15.0) AS BIGINT),
         CAST(floor(max_y/15.0) AS BIGINT) FROM feats
),
cells AS (
  SELECT corner, cx, cy, COUNT(*) AS cnt FROM assigned GROUP BY corner, cx, cy
)
SELECT corner, CAST(SUM(cnt*cnt) AS BIGINT) AS cost FROM cells GROUP BY corner
"""

# J1 candidates with eps(=30) > mesh(=15): radius-2 (5x5) neighbor stencil
# with the crossing predicate — the documented deviation from the
# reference's throw at eps > mesh (grid.hpp:125-127); F1/F2 at eps = 30.
GRID_CANDIDATES_WIDE_SQL = f"""
WITH feats AS ({CURVE_FEATURES_SQL}),
q AS (SELECT * FROM feats WHERE traj_id % 50 = 0),
offs AS (SELECT dxo.o AS dx, dyo.o AS dy
         FROM (SELECT unnest(generate_series(-2, 2)) AS o) dxo,
              (SELECT unnest(generate_series(-2, 2)) AS o) dyo),
qcells AS (
  SELECT q.*,
         CAST(floor(q.min_x/15.0) AS BIGINT) + offs.dx AS cell_x,
         CAST(floor(q.min_y/15.0) AS BIGINT) + offs.dy AS cell_y
  FROM q, offs
  WHERE q.min_x - 30.0 < (floor(q.min_x/15.0) + offs.dx + 1) * 15.0
    AND q.min_x + 30.0 >= (floor(q.min_x/15.0) + offs.dx) * 15.0
    AND q.min_y - 30.0 < (floor(q.min_y/15.0) + offs.dy + 1) * 15.0
    AND q.min_y + 30.0 >= (floor(q.min_y/15.0) + offs.dy) * 15.0
),
d AS (
  SELECT feats.*,
         CAST(floor(min_x/15.0) AS BIGINT) AS cell_x,
         CAST(floor(min_y/15.0) AS BIGINT) AS cell_y
  FROM feats
)
SELECT qc.traj_id AS query_id, d.traj_id AS traj_id
FROM qcells qc JOIN d ON qc.cell_x = d.cell_x AND qc.cell_y = d.cell_y
WHERE abs(qc.min_x - d.min_x) <= 30.0 AND abs(qc.max_x - d.max_x) <= 30.0
  AND abs(qc.min_y - d.min_y) <= 30.0 AND abs(qc.max_y - d.max_y) <= 30.0
  AND (qc.x_first - d.x_first)*(qc.x_first - d.x_first)
      + (qc.y_first - d.y_first)*(qc.y_first - d.y_first) <= 900.0
  AND (qc.x_last - d.x_last)*(qc.x_last - d.x_last)
      + (qc.y_last - d.y_last)*(qc.y_last - d.y_last) <= 900.0
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


# J2 bb signature-ball candidates: start/end Euclidean + MBR Chebyshev all
# within eps (detail/bb/spatial_index.hpp:28-39 nd_point_dist, :228-242
# signature); eps = 15, queries = traj_id % 50 == 0.
SIGNATURE_CANDIDATES_SQL = f"""
WITH feats AS ({CURVE_FEATURES_SQL}),
q AS (SELECT * FROM feats WHERE traj_id % 50 = 0)
SELECT q.traj_id AS query_id, d.traj_id AS traj_id
FROM q JOIN feats d
  ON (q.x_first - d.x_first)*(q.x_first - d.x_first)
     + (q.y_first - d.y_first)*(q.y_first - d.y_first) <= 225.0
 AND (q.x_last - d.x_last)*(q.x_last - d.x_last)
     + (q.y_last - d.y_last)*(q.y_last - d.y_last) <= 225.0
 AND abs(q.min_x - d.min_x) <= 15.0
 AND abs(q.min_y - d.min_y) <= 15.0
 AND abs(q.max_x - d.max_x) <= 15.0
 AND abs(q.max_y - d.max_y) <= 15.0
"""


# ---------------------------------------------------------------------------
# Relational analytics oracles (operators/relational.py) — TPC-H-shaped
# queries over the star schema; money in integer cents.
# ---------------------------------------------------------------------------

PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

SHIPPING_PRIORITY_SQL = """
SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
       o.o_orderdate, o.o_orderpriority,
       CAST(SUM(CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""

REGION_REVENUE_SQL = """
SELECT r.r_name,
       CAST(SUM(CAST(round(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


# ---------------------------------------------------------------------------
# Event analytics oracles (operators/events.py). Metrics are counts and
# integer cent-sums so results are independent of partitioning/order.
# ---------------------------------------------------------------------------

# Tumbling 1-hour windows per event_type. Spark's F.window aligns to the
# epoch, which for whole hours equals date_trunc('hour', ts).
WINDOWED_EVENTS_SQL = """
SELECT date_trunc('hour', ts) AS win_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
"""

# Gap-based sessions (gap = 1800 s), tie-broken by event_id like the Spark
# window ORDER BY (ts, event_id).
SESSIONS_SQL = """
WITH gaps AS (
  SELECT user_id, event_id, ts, value,
         epoch(ts) - epoch(lag(ts) OVER w) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), marked AS (
  SELECT *, CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_s
  FROM gaps
), sess AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_id
  FROM marked
)
SELECT user_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM sess
GROUP BY user_id, session_id
"""

# JSON prop extraction parity (get_json_object vs DuckDB json path).
PROPS_SQL = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
"""


# ---------------------------------------------------------------------------
# Web-text pipeline oracles (token hash / shingle math mirrors
# operators/textql.py and operators/dedup.py exactly).
# ---------------------------------------------------------------------------

def _markers_sql() -> dict[str, str]:
    from frechetrange_spark.operators.textql import LANG_MARKERS

    return {
        lang: ", ".join(f"'{w}'" for w in ws) for lang, ws in LANG_MARKERS.items()
    }


_TOKS_CTE = """
toks AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
  FROM documents
)
"""

TOKEN_STATS_SQL = f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(list_filter(toks, t -> regexp_matches(t, '^[a-zA-Z]+$'))) AS BIGINT)
         AS n_alpha_tokens,
       CAST(len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$'))) AS BIGINT)
         AS n_num_tokens,
       CAST(length(text) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_token_len
FROM toks
"""


def _lang_id_sql() -> str:
    m = _markers_sql()
    langs = sorted(m)
    scores = ",\n       ".join(
        f"len(list_filter(toks, t -> t IN ({m[lang]}))) AS score_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    cases = "\n         ".join(
        f"WHEN score_{lang} = {best} AND {best} > 0 THEN '{lang}'" for lang in langs
    )
    return f"""
WITH {_TOKS_CTE},
scored AS (
  SELECT doc_id,
       {scores}
  FROM toks
)
SELECT doc_id,
       CASE {cases}
         ELSE 'und' END AS lang_pred
FROM scored
"""


LANG_ID_SQL = _lang_id_sql()


def _quality_sql() -> str:
    from frechetrange_spark.operators.textql import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       CAST(CAST(len(toks) AS DOUBLE) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
         AS uniq_ratio,
       CAST(len(list_filter(toks, t -> t IN ({stops}))) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE) AS stop_ratio,
       least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.3
         + (CAST(len(list_distinct(toks)) AS DOUBLE)
            / CAST(len(toks) AS DOUBLE)) * 0.3
         + (1.0 - CAST(len(list_filter(toks, t -> t IN ({stops}))) AS DOUBLE)
            / CAST(len(toks) AS DOUBLE)) * 0.2
         + least((CAST(length(text) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) / 8.0,
                 1.0) * 0.2 AS quality
FROM toks
"""


QUALITY_SQL = _quality_sql()

# token hash: (len*31 + ascii(first)*7 + ascii(last)*13) % 1000003
_TH = "((length(tok)*31 + ascii(tok)*7 + ascii(substr(tok, length(tok), 1))*13) % 1000003)"

_TH_CTE = f"""
tokpos AS (
  SELECT doc_id, toks[i] AS tok, i AS pos
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
),
th AS (
  SELECT doc_id, pos, {_TH} AS th FROM tokpos
)
"""

FINGERPRINTS_SQL = f"""
WITH {_TH_CTE},
fps AS (
  SELECT doc_id,
         ((lag(th, 3) OVER w * 131 + lag(th, 2) OVER w) * 131
            + lag(th, 1) OVER w) * 131 + th AS fp
  FROM th
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
)
SELECT DISTINCT doc_id, fp
FROM fps WHERE fp IS NOT NULL AND fp % 16 = 0
"""

EXACT_DEDUP_SQL = """
SELECT doc_id,
       md5(text) AS text_md5,
       CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS group_size,
       doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
FROM documents
"""

_SHINGLES_CTE = f"""
{_TH_CTE},
shingles AS (
  SELECT DISTINCT doc_id,
         (lag(th, 2) OVER w * 131 + lag(th, 1) OVER w) * 131 + th AS sh
  FROM th
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
shingles_nn AS (SELECT doc_id, sh FROM shingles WHERE sh IS NOT NULL)
"""

def _jaccard_pairs_sql() -> str:
    """Mirrors dedup.jaccard_pairs(docs, 0.5, max_df=JACCARD_MAX_DF): the
    graded standalone path drops stop-shingles (DF > cap) before the
    self-join, and sizes/intersections are over the capped shingle space."""
    from frechetrange_spark.operators.dedup import JACCARD_MAX_DF

    return f"""
WITH {_SHINGLES_CTE},
kept AS (SELECT sh FROM shingles_nn GROUP BY sh HAVING COUNT(*) <= {JACCARD_MAX_DF}),
capped AS (SELECT s.doc_id, s.sh FROM shingles_nn s JOIN kept k ON s.sh = k.sh),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, CAST(COUNT(*) AS BIGINT) AS inter
  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_1, doc_id_2,
       CAST(inter AS DOUBLE) / CAST(s1.sz + s2.sz - inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = doc_id_1
JOIN sizes s2 ON s2.doc_id = doc_id_2
WHERE CAST(inter AS DOUBLE) / CAST(s1.sz + s2.sz - inter AS DOUBLE) >= 0.5
"""


JACCARD_PAIRS_SQL = _jaccard_pairs_sql()


def _minhash_cte() -> str:
    from frechetrange_spark.operators.dedup import P, _perm_params

    perms = ", ".join(f"({i}, {a}, {b})" for i, a, b in _perm_params())
    return f"""
perms(perm_id, a, b) AS (SELECT * FROM (VALUES {perms})),
mh AS (
  SELECT s.doc_id, p.perm_id,
         CAST(MIN((p.a * s.sh + p.b) % {P}) AS BIGINT) AS mh
  FROM shingles_nn s, perms p
  GROUP BY s.doc_id, p.perm_id
)
"""


MINHASH_SIGNATURES_SQL = f"""
WITH {_SHINGLES_CTE},
{_minhash_cte()}
SELECT doc_id, CAST(perm_id AS BIGINT) AS perm_id, mh FROM mh
"""

MINHASH_LSH_SQL = f"""
WITH {_SHINGLES_CTE},
{_minhash_cte()},
bands AS (
  SELECT doc_id, CAST(perm_id // 4 AS BIGINT) AS band_id,
         string_agg(mh::VARCHAR, ':' ORDER BY perm_id) AS band_key
  FROM mh GROUP BY doc_id, perm_id // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM shingles_nn GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, CAST(COUNT(*) AS BIGINT) AS inter
  FROM shingles_nn a JOIN shingles_nn b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_id_1, i.doc_id_2,
       CAST(inter AS DOUBLE) / CAST(s1.sz + s2.sz - inter AS DOUBLE) AS jaccard
FROM inter i
JOIN cand c ON c.doc_id_1 = i.doc_id_1 AND c.doc_id_2 = i.doc_id_2
JOIN sizes s1 ON s1.doc_id = i.doc_id_1
JOIN sizes s2 ON s2.doc_id = i.doc_id_2
WHERE CAST(inter AS DOUBLE) / CAST(s1.sz + s2.sz - inter AS DOUBLE) >= 0.5
"""


def _simhash_cte() -> str:
    from frechetrange_spark.operators.dedup import _SIM_P, _simbit_params

    sums = ",\n         ".join(
        f"SUM((((th * {a} + {c}) % {_SIM_P}) % 2) * 2 - 1) AS s{b}"
        for b, a, c in _simbit_params()
    )
    # bit 63's place value is int64-min; spelled (-max - 1) so the literal
    # parses as BIGINT, and added last so every partial sum stays in range
    sim = " + ".join(
        f"CASE WHEN s{b} > 0 THEN "
        + (str(1 << b) if b < 63 else "(-9223372036854775807 - 1)")
        + " ELSE 0 END"
        for b, _, _ in _simbit_params()
    )
    return f"""
thall AS (
  SELECT doc_id, {_TH} AS th
  FROM (SELECT doc_id, toks[i] AS tok
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
              FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g)
),
bitsums AS (
  SELECT doc_id,
         {sums}
  FROM thall GROUP BY doc_id
),
sims AS (SELECT doc_id, CAST({sim} AS BIGINT) AS sim FROM bitsums)
"""


SIMHASH_SQL = f"""
WITH {_simhash_cte()}
SELECT doc_id, sim FROM sims
"""

SIMHASH_PAIRS_SQL = f"""
WITH {_simhash_cte()}
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= 7
"""


# ---------------------------------------------------------------------------
# Multimodal metadata oracles (operators/multimodal.py synth_media).
# ---------------------------------------------------------------------------

MEDIA_META_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       CAST(64 + (doc_id * 13) % 448 AS BIGINT) AS width,
       CAST(64 + (doc_id * 29) % 448 AS BIGINT) AS height,
       CAST((doc_id * 97) % 60000 AS BIGINT) AS duration_ms
FROM documents
"""

def _media_decode_sql() -> str:
    from frechetrange_spark.operators.multimodal import (
        IMG_H,
        IMG_W,
        WAV_SAMPLES,
    )

    n_img = IMG_W * IMG_H * 3
    return f"""
WITH img AS (
  SELECT doc_id, 'image' AS media_type,
         CAST({IMG_W} AS BIGINT) AS width, CAST({IMG_H} AS BIGINT) AS height,
         CAST({n_img} AS BIGINT) AS n_values,
         CAST(SUM((doc_id*7 + i*13) % 256) AS BIGINT) AS value_sum
  FROM documents,
       (SELECT unnest(generate_series(0, {n_img - 1})) AS i) g
  WHERE doc_id % 3 = 0
  GROUP BY doc_id
), aud AS (
  SELECT doc_id, 'audio' AS media_type,
         CAST(0 AS BIGINT) AS width, CAST(0 AS BIGINT) AS height,
         CAST({WAV_SAMPLES} AS BIGINT) AS n_values,
         CAST(SUM(((doc_id*31 + i*17) % 65536) - 32768) AS BIGINT) AS value_sum
  FROM documents,
       (SELECT unnest(generate_series(0, {WAV_SAMPLES - 1})) AS i) g
  WHERE doc_id % 3 = 1
  GROUP BY doc_id
), vid AS (
  SELECT doc_id, 'video' AS media_type,
         CAST({IMG_W} AS BIGINT) AS width, CAST({IMG_H} AS BIGINT) AS height,
         CAST((2 + (doc_id // 3) % 3) * {n_img} AS BIGINT) AS n_values,
         CAST(SUM((doc_id*7 + f*101 + i*13) % 256) AS BIGINT) AS value_sum
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, 1 + (doc_id // 3) % 3)) AS f) gf,
       (SELECT unnest(generate_series(0, {n_img - 1})) AS i) g
  WHERE doc_id % 3 = 2
  GROUP BY doc_id
)
SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid
"""


MEDIA_DECODE_SQL = _media_decode_sql()


def _frame_decode_sql() -> str:
    """Mirrors extract_frames(synth_media_binary(docs), every_ms=1000):
    FRV1 video rows (doc_id % 3 == 2) carry 2 + (doc_id // 3) % 3 frames
    at VID_INTERVAL_MS spacing; sampling is schedule-aligned — frame f is
    kept iff it is the FIRST frame at-or-after some tick k*1000 ms, i.e.
    iff an integer k lies in ((f-1)*interval/1000, f*interval/1000]
    (f = 0 is always the k = 0 frame); each kept frame's pixel sum
    follows the (doc_id, frame, index) generator formula."""
    from frechetrange_spark.operators.multimodal import IMG_H, IMG_W, VID_INTERVAL_MS

    n_img = IMG_W * IMG_H * 3
    iv = VID_INTERVAL_MS
    return f"""
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(f * {iv} AS BIGINT) AS frame_ts_ms,
       CAST({IMG_W} AS BIGINT) AS width, CAST({IMG_H} AS BIGINT) AS height,
       CAST(SUM((doc_id*7 + f*101 + i*13) % 256) AS BIGINT) AS pix_sum
FROM documents,
     LATERAL (SELECT unnest(generate_series(0, 1 + (doc_id // 3) % 3)) AS f) gf,
     (SELECT unnest(generate_series(0, {n_img - 1})) AS i) g
WHERE doc_id % 3 = 2
  AND (f = 0 OR (((f-1) * {iv}) // 1000 + 1) * 1000 <= f * {iv})
GROUP BY doc_id, f
"""


FRAME_DECODE_SQL = _frame_decode_sql()

FRAME_SAMPLE_SQL = """
WITH media AS (
  SELECT doc_id, CAST((doc_id * 97) % 60000 AS BIGINT) AS duration_ms
  FROM documents
  WHERE doc_id % 3 = 2 AND (doc_id * 97) % 60000 > 0
)
SELECT doc_id, CAST(unnest(generate_series(0, duration_ms - 1, 1000)) AS BIGINT)
         AS frame_ts_ms
FROM media
"""


def _resize_images_sql(tw: int = 8, th: int = 8) -> str:
    """Mirrors resize_images(synth_media_binary(docs), 8, 8) graded as a
    per-image pixel sum: image rows (doc_id % 3 == 0) are IMG_W x IMG_H
    PPMs whose source pixel at flat index i is (doc_id*7 + i*13) % 256
    (_img_pixels); nearest-neighbor maps target (ty, tx) to source row
    (ty*IMG_H)//th and column (tx*IMG_W)//tw — the same floor-gather the
    numpy kernel's index arrays compute — so the resized pixel sum is a
    closed-form integer aggregate."""
    from frechetrange_spark.operators.multimodal import IMG_H, IMG_W

    return f"""
SELECT doc_id,
       CAST({tw} AS BIGINT) AS width, CAST({th} AS BIGINT) AS height,
       CAST(SUM((doc_id*7 + ((((ty*{IMG_H})//{th})*{IMG_W}
                 + ((tx*{IMG_W})//{tw}))*3 + c)*13) % 256) AS BIGINT)
         AS pix_sum
FROM documents,
     (SELECT unnest(generate_series(0, {th - 1})) AS ty) g1,
     (SELECT unnest(generate_series(0, {tw - 1})) AS tx) g2,
     (SELECT unnest(generate_series(0, 2)) AS c) g3
WHERE doc_id % 3 = 0
GROUP BY doc_id
"""


RESIZE_IMAGES_SQL = _resize_images_sql()

# extract_features is a 16-bin high-nibble byte histogram over the
# synth_media payload (= the document text's UTF-8 bytes), normalized.
# Graded integer-exactly: bin 7's COUNT is recovered on the Spark side as
# round(f7 * n_bytes) — the float ratio times its own denominator is
# within 1e-10 of the integer count, so the round is exact — and the
# oracle counts hex('7') at the high-nibble positions of the payload's
# hex dump (byte i's high nibble is hex char 2i+1; DuckDB hex() is
# uppercase, bin 7 is '7').
MEDIA_FEATURES_SQL = """
SELECT doc_id,
       CAST(length(list_filter(generate_series(1, n),
                               i -> substr(h, 2*i - 1, 1) = '7'))
            AS BIGINT) AS f7_cnt,
       CAST(n AS BIGINT) AS n_bytes
FROM (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Spatial extension oracles: point-in-polygon, raster/vector tiles.
# ---------------------------------------------------------------------------

def _pip_sql() -> str:
    from frechetrange_spark.operators.polygon import FIXED_POLYGONS, polygon_edges

    vals = ", ".join(
        f"({pid}, {a[0]}, {a[1]}, {b[0]}, {b[1]})"
        for pid, verts in FIXED_POLYGONS.items()
        for a, b in polygon_edges(verts)
    )
    return f"""
WITH pts AS ({POINTS_SQL}),
edges(poly_id, x1, y1, x2, y2) AS (SELECT * FROM (VALUES {vals})),
crossings AS (
  SELECT p.traj_id, p.seq, e.poly_id, COUNT(*) AS c
  FROM pts p JOIN edges e
    ON ((e.y1 > p.y) != (e.y2 > p.y))
   AND p.x < (e.x2 - e.x1) * (p.y - e.y1) / (e.y2 - e.y1) + e.x1
  GROUP BY 1, 2, 3
)
SELECT traj_id, seq, CAST(poly_id AS BIGINT) AS poly_id
FROM crossings WHERE c % 2 = 1
"""


POINT_IN_POLYGON_SQL = _pip_sql()

# rasterize at base_mesh=16, level=2 -> mesh 4.0
RASTERIZE_SQL = f"""
WITH pts AS ({POINTS_SQL})
SELECT CAST(floor(x / 4.0) AS BIGINT) AS cell_x,
       CAST(floor(y / 4.0) AS BIGINT) AS cell_y,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM pts GROUP BY 1, 2
"""

# tile pyramid base_mesh=16, levels 0..3 — every level recomputed directly
# from the points (proves the Spark side's parent-rollup invariant).
TILE_PYRAMID_SQL = f"""
WITH pts AS ({POINTS_SQL})
SELECT CAST(lvl.l AS BIGINT) AS level,
       CAST(floor(x / (16.0 / (1 << lvl.l))) AS BIGINT) AS cell_x,
       CAST(floor(y / (16.0 / (1 << lvl.l))) AS BIGINT) AS cell_y,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM pts, (VALUES (0), (1), (2), (3)) lvl(l)
GROUP BY 1, 2, 3
"""

VECTORIZE_SQL = f"""
WITH pts AS ({POINTS_SQL}),
raster AS (
  SELECT CAST(floor(x / 4.0) AS BIGINT) AS cell_x,
         CAST(floor(y / 4.0) AS BIGINT) AS cell_y,
         CAST(COUNT(*) AS BIGINT) AS n_points
  FROM pts GROUP BY 1, 2
)
SELECT cell_x, cell_y,
       cell_x * 4.0 AS min_x, cell_y * 4.0 AS min_y,
       (cell_x + 1) * 4.0 AS max_x, (cell_y + 1) * 4.0 AS max_y,
       n_points
FROM raster
"""

# ANN brute-force cosine top-k (k=5, query_mod=50), graded with the cosine
# quantized to integer micro-units (cosine_e6) so the compare is exact-typed:
# both engines compute the cosine in double precision from the same float32
# parquet values; the synthetic embeddings' smallest adjacent top-6 gap is
# ~2e-5 (measured at sf 0.001/0.01/0.1) vs ~1e-15 cross-engine error, so
# ranks and the quantization are stable.
ANN_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id % 50 = 0
), s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
), r AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id
         ) AS BIGINT) AS rank
  FROM s
)
SELECT query_id, vec_id,
       CAST(round(cosine * 1000000) AS BIGINT) AS cosine_e6, rank
FROM r WHERE rank <= 5
"""


def ivf_centroids_path(sf_name: str) -> str:
    """Where the graded IVF queries persist their (deterministic, fixed-
    seed k-means) centroid matrix as parquet so this oracle can replay
    the probe in SQL. Must agree with __spark_entry__.SNAPSHOT_ROOT."""
    return (
        "/tmp/frechetrange_graded_snapshots_v1/"
        f"ivf_centroids_{sf_name}.parquet"
    )


def ann_topk_ivf_sql(
    centroids_path: str,
    n_assign: int = 3,
    n_probe: int = 8,
    k: int = 5,
    query_mod: int = 50,
) -> str:
    """IVF ANN oracle: replays similarity.ann_topk_ivf from first
    principles — base-side multi-assign to the ``n_assign`` nearest
    centroids (the spill), query-side ``n_probe`` probe set, candidates
    = base vectors sharing >= 1 probed cell, exact cosine + top-k window
    — reading the SAME centroid matrix the Spark side fit (persisted as
    parquet by the graded query; k-means itself is not SQL, the probe
    around it is). Centroid ranking ties break by cell id; the synthetic
    embeddings are continuous so exact ties do not occur, and the
    centroid-assignment margins dwarf the ~1e-15 cross-engine cosine
    rounding (same argument as ANN_TOPK_SQL's quantization note).
    ann_topk_ivf_partitioned returns the identical result set for the
    same centroids (parity-tested), so one oracle serves both graded
    rows."""
    return f"""
WITH cents AS (
  SELECT cell, centroid FROM read_parquet('{centroids_path}')
), base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), ba AS (
  SELECT vec_id, cell FROM (
    SELECT b.vec_id, c.cell,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY list_cosine_similarity(b.e, c.centroid) DESC, c.cell
           ) AS rn
    FROM base b CROSS JOIN cents c
  ) WHERE rn <= {n_assign}
), q AS (
  SELECT vec_id AS query_id, e AS qe FROM base WHERE vec_id % {query_mod} = 0
), qp AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qe, c.centroid) DESC, c.cell
           ) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn <= {n_probe}
), cand AS (
  SELECT DISTINCT p.query_id, a.vec_id
  FROM qp p JOIN ba a USING (cell)
  WHERE a.vec_id <> p.query_id
), s AS (
  SELECT c.query_id, c.vec_id,
         list_cosine_similarity(q.qe, b.e) AS cosine
  FROM cand c JOIN q USING (query_id) JOIN base b USING (vec_id)
), r AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id
         ) AS BIGINT) AS rank
  FROM s
)
SELECT query_id, vec_id,
       CAST(round(cosine * 1000000) AS BIGINT) AS cosine_e6, rank
FROM r WHERE rank <= {k}
"""


ANN_TOPK_IVF_SQL = ann_topk_ivf_sql(ivf_centroids_path("sf0.01"))


def lsh_hyperplanes_path(dim: int = 64) -> str:
    """Where the graded neardup_lsh query persists its (fixed-seed)
    random-hyperplane matrix as parquet so this oracle can replay the
    signature/band pipeline in SQL. Seed-deterministic, so one file
    serves every scale factor. Must agree with
    __spark_entry__.SNAPSHOT_ROOT."""
    return (
        "/tmp/frechetrange_graded_snapshots_v1/"
        f"lsh_hyperplanes_{dim}.parquet"
    )


def neardup_lsh_sql(
    hyperplanes_path: str,
    tau: float = 0.45,
    band_bits: int = 2,
) -> str:
    """Vector near-dup LSH oracle: replays similarity.neardup_lsh from
    first principles against the SAME hyperplane matrix the Spark side
    drew (persisted as parquet by the graded query; the random draw is
    the only non-SQL step). Signature bit b = sign of the hyperplane dot
    product; bands of ``band_bits`` consecutive bits; candidates = pairs
    sharing >= 1 (band_id, band_val) bucket; every candidate verified
    with an exact cosine >= tau. Stability: bit signs have O(1) margins
    (standard-normal hyperplanes against unit-scale embeddings) and the
    verify threshold sits ~2e-5+ away from any corpus cosine (same
    measurement as ANN_TOPK_SQL), both dwarfing the ~1e-15 cross-engine
    summation-order error; the cosine is quantized to micro-units for
    the exact-typed value hash."""
    return f"""
WITH h AS (
  SELECT bit, w FROM read_parquet('{hyperplanes_path}')
), base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), bits AS (
  SELECT b.vec_id, h.bit,
         CASE WHEN list_dot_product(b.e, h.w) > 0.0 THEN 1 ELSE 0 END AS bv
  FROM base b CROSS JOIN h
), bands AS (
  SELECT vec_id, bit // {band_bits} AS band_id,
         CAST(SUM(bv << (bit % {band_bits})) AS BIGINT) AS band_val
  FROM bits GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2
  FROM bands a JOIN bands b USING (band_id, band_val)
  WHERE a.vec_id < b.vec_id
), s AS (
  SELECT c.vec_id_1, c.vec_id_2,
         list_cosine_similarity(e1.e, e2.e) AS cosine
  FROM cand c
  JOIN base e1 ON e1.vec_id = c.vec_id_1
  JOIN base e2 ON e2.vec_id = c.vec_id_2
)
SELECT vec_id_1, vec_id_2,
       CAST(round(cosine * 1000000) AS BIGINT) AS cosine_e6
FROM s WHERE cosine >= {tau}
"""


NEARDUP_LSH_SQL = neardup_lsh_sql(lsh_hyperplanes_path())
