"""Fréchet range query: brute-force oracle and the dv-grid indexed pipeline.

Shape (classic filter-and-refine spatial join, SURVEY §2.3/§3.2):

1. candidate generation — equi-join on grid cell id (J1). The dataset side
   is keyed by ONE MBR corner cell (``floor(corner/mesh)``, grid.hpp:352-358,
   corner chosen by the Σ bucket² statistic, grid.hpp:410-432); the query
   side explodes the neighbor cells its eps-box crosses (grid.hpp:462-488).
   Each dataset curve lives in exactly one cell ⇒ no post-join dedup.
2. native filters, pushed by Catalyst below/into the join:
   F2 MBR-border check (grid.hpp:683-717), F1 endpoint check
   (dv/frechet_distance.hpp:44-47) — both plain column predicates.
3. F3 farthest-MBR positive filter (grid.hpp:719-730): accepts without
   running any kernel.
4. refine — Arrow-batched kernel funnel per candidate pair (the
   simplification funnel, the equal-time-distance accept, then the exact
   free-space decider), inside ``mapInArrow``: one explicit round-robin
   repartition, then no further shuffles between funnel stages.

Everything before step 4 is whole-stage-codegen relational work; step 4 is
the only Python, and it sees only survivors of the funnel.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frechetrange_spark.operators.tiling import cell_coord, explode_neighbor_cells

_CORNERS = {
    "min_min": ("min_x", "min_y"),
    "min_max": ("min_x", "max_y"),
    "max_min": ("max_x", "min_y"),
    "max_max": ("max_x", "max_y"),
}


def corner_costs(curves: DataFrame, mesh: float) -> DataFrame:
    """A4: the Σ(bucket size²) cell-crowding statistic per candidate MBR
    corner (grid.hpp:334, 394-397, 410-432) — one aggregate job over an
    exploded 4-variant column. Returns (corner, cost) with cost = the sum
    over occupied cells of count² for that corner's home-cell assignment;
    ``choose_corner`` is the 4-row argmin over this."""
    variants = F.array(
        *[
            F.struct(
                F.lit(name).alias("corner"),
                cell_coord(F.col(cx), mesh).alias("cx"),
                cell_coord(F.col(cy), mesh).alias("cy"),
            )
            for name, (cx, cy) in _CORNERS.items()
        ]
    )
    return (
        curves.select(F.explode(variants).alias("v"))
        .groupBy("v.corner", "v.cx", "v.cy")
        .agg(F.count("*").alias("cnt"))
        .groupBy("corner")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("cost"))
    )


def choose_corner(curves: DataFrame, mesh: float) -> str:
    """A5: pick the MBR corner minimizing the Σ bucket² statistic
    (grid.hpp:410-432); ties break on corner name like the oracle sort."""
    counts = corner_costs(curves, mesh).orderBy("cost", "corner").collect()
    return counts[0]["corner"]


def mesh_costs(
    curves: DataFrame,
    eps: float,
    candidates: list[float],
    corner: str = "min_min",
) -> list[dict]:
    """Expected candidate-join work per mesh candidate, computed from the
    same cell statistics A4 uses — the reference fixes mesh by convention
    (its own benchmark uses mesh = 10*eps, benchmark/benchmark.py:59) and
    THROWS outside it (grid.hpp:125-127); here the workload model is
    explicit. For each mesh m, with the dataset as its own query proxy
    (the self-join/batch-workload shape):

    - ``pairs`` = Σ_cells q_c * n_c — the exact equi-join output size of
      grid_candidates BEFORE the F1/F2 predicates (q_c = exploded query
      stencil rows landing in the cell, n_c = curves homed there):
      the refine-side fan-out a too-coarse mesh explodes.
    - ``exploded`` = Σ q_c — the query-side duplication a too-fine mesh
      explodes (stencil radius grows as ceil(eps/m)).

    cost = pairs + exploded; two cheap aggregation jobs per candidate,
    run once at build time."""
    from frechetrange_spark.operators.tiling import explode_neighbor_cells

    cx_col, cy_col = _CORNERS[corner]
    scalars = curves.select(cx_col, cy_col)
    out = []
    for m in candidates:
        hist_d = (
            scalars.select(
                cell_coord(F.col(cx_col), m).alias("cell_x"),
                cell_coord(F.col(cy_col), m).alias("cell_y"),
            )
            .groupBy("cell_x", "cell_y")
            .agg(F.count("*").alias("n_c"))
        )
        hist_q = (
            explode_neighbor_cells(
                _q(scalars, "q_"), f"q_{cx_col}", f"q_{cy_col}", m, eps
            )
            .groupBy("cell_x", "cell_y")
            .agg(F.count("*").alias("q_c"))
        )
        row = (
            hist_q.join(hist_d, ["cell_x", "cell_y"])
            .agg(F.sum(F.col("q_c") * F.col("n_c")).alias("pairs"))
            .collect()[0]
        )
        # exploded counts the FULL stencil — rows landing in empty cells
        # are still shuffled before the join drops them.
        erow = hist_q.agg(F.sum("q_c").alias("exploded")).collect()[0]
        pairs = int(row["pairs"] or 0)
        exploded = int(erow["exploded"] or 0)
        out.append(
            {
                "mesh": float(m),
                "pairs": pairs,
                "exploded": exploded,
                "cost": pairs + exploded,
            }
        )
    return out


def choose_mesh(
    curves: DataFrame,
    eps: float,
    candidates: list[float] | None = None,
    corner: str = "min_min",
) -> float:
    """Pick the mesh minimizing the mesh_costs workload model over a
    small eps-relative grid (default {1, 2, 5, 10, 20} * eps — brackets
    the reference's own 10*eps convention); ties prefer the larger mesh
    (fewer cells, smaller index histogram)."""
    if candidates is None:
        candidates = [eps * f for f in (1.0, 2.0, 5.0, 10.0, 20.0)]
    costs = mesh_costs(curves, eps, candidates, corner)
    best = min(costs, key=lambda c: (c["cost"], -c["mesh"]))
    return best["mesh"]


def choose_salt(
    index_df: DataFrame,
    parallelism: int,
    min_hot_rows: int = 1000,
    trigger: float = 4.0,
    cap: int = 16,
) -> int | None:
    """Data-driven hot-cell salt selection (SURVEY J1 skew handling).

    The quantity that breaks an unsalted cell equi-join is FAN-OUT skew:
    one shuffle partition owns the hottest cell and must produce ~top²
    candidate pairs (self-join shape) while a balanced partition produces
    Σcnt²/parallelism — AQE cannot split it because the hot cell is small
    in BYTES (scripts/bench_skew.py). Σcnt² is the same A4 statistic the
    corner argmin uses. Salt when the hot cell's pair share exceeds
    ``trigger`` balanced partitions AND is big enough in absolute terms
    (top >= min_hot_rows, i.e. >= 1M pairs) that the salted plan's extra
    query-side duplication pays for itself; salt ~ the imbalance ratio,
    capped (each salt step duplicates the exploded query rows once).
    Returns None on uniform corpora — the plan is then byte-identical to
    the unsalted one."""
    row = (
        index_df.groupBy("cell_x", "cell_y")
        .agg(F.count("*").alias("cnt"))
        .agg(
            F.max("cnt").alias("top"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq"),
        )
        .collect()[0]
    )
    return _salt_from_stats(
        int(row["top"] or 0),
        float(row["sumsq"] or 0.0),
        parallelism,
        min_hot_rows=min_hot_rows,
        trigger=trigger,
        cap=cap,
    )


def _salt_from_stats(
    top: int,
    sumsq: float,
    parallelism: int,
    min_hot_rows: int = 1000,
    trigger: float = 4.0,
    cap: int = 16,
) -> int | None:
    """``choose_salt``'s decision rule over already-computed cell stats
    (max bucket size, Σ bucket²) — shared with build_grid_index's fused
    single-pass statistics job."""
    if top < min_hot_rows or sumsq <= 0.0:
        return None
    ratio = (top * top) / (sumsq / max(int(parallelism), 1))
    if ratio < trigger:
        return None
    return int(min(cap, max(2, round(ratio))))


def build_grid_index(
    curves: DataFrame,
    mesh: float | None = None,
    corner: str | None = None,
    auto_salt: bool = True,
    eps: float | None = None,
    mesh_candidates: list[float] | None = None,
):
    """Attach the home-cell columns for the chosen corner. Returns
    (index_df, meta); meta carries mesh, corner, and — when ``auto_salt``
    — a data-driven ``salt`` that ``grid_candidates`` applies by default,
    so hot-cell corpora get the skew split without any manual flag
    (None on uniform corpora: plan unchanged). Meta also carries
    ``payload_bytes`` (the estimated broadcast size of the array payload,
    _est_broadcast_bytes) so ``range_query_grid(attach="auto")`` can pick
    its attach arm from build-time stats instead of re-scanning the
    array columns per query. At scale, write ``index_df``
    partitioned/bucketed by (cell_x, cell_y) so the query join prunes
    partitions (sources/index_table.py persists meta too).

    ``mesh=None`` selects the mesh from corpus statistics via
    ``choose_mesh`` (requires ``eps``, the expected query threshold) —
    the reference fixes mesh by convention (mesh = 10*eps in its own
    benchmark, benchmark/benchmark.py:59) where this engine measures the
    candidate-join workload per candidate mesh and argmins, the same
    Σ-bucket statistic shape as the A4/A5 corner choice. The chosen
    value and the flag land in meta (``mesh_auto``)."""
    mesh_auto = mesh is None
    if mesh_auto:
        if eps is None:
            raise ValueError(
                "build_grid_index(mesh=None) auto-selects the mesh from the "
                "expected query threshold: pass eps="
            )
        if corner is None:
            # Probe corner at the reference's conventional mesh; the corner
            # statistic (argmin Σ bucket²) is about corpus shape, not mesh.
            corner = choose_corner(curves, 10.0 * float(eps))
        mesh = choose_mesh(curves, float(eps), mesh_candidates, corner)
    if corner is None:
        corner = choose_corner(curves, mesh)
    cx_col, cy_col = _CORNERS[corner]
    index_df = curves.withColumn(
        "cell_x", cell_coord(F.col(cx_col), mesh)
    ).withColumn("cell_y", cell_coord(F.col(cy_col), mesh))
    meta: dict = {
        "mesh": float(mesh),
        "corner": corner,
        "salt": None,
        "mesh_auto": mesh_auto,
    }
    # ONE stats pass (r06): the per-cell histogram aggregate carries the
    # array-payload size sums along, so the salt choice and the
    # payload_bytes broadcast estimate share a single job over the curve
    # table instead of two full scans (guide §1.2: don't compute things
    # twice). Semantics of both statistics are unchanged.
    size_cols = ["xs"]
    i = 0
    while f"s{i}_xs" in index_df.columns:
        size_cols.append(f"s{i}_xs")
        i += 1
    per_cell = index_df.groupBy("cell_x", "cell_y").agg(
        F.count("*").alias("cnt"),
        *[F.sum(F.size(c)).alias(f"_p{j}") for j, c in enumerate(size_cols)],
    )
    row = per_cell.agg(
        F.max("cnt").alias("top"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq"),
        F.sum("cnt").alias("n"),
        *[F.sum(f"_p{j}").alias(f"_p{j}") for j in range(len(size_cols))],
    ).collect()[0]
    if auto_salt:
        meta["salt"] = _salt_from_stats(
            int(row["top"] or 0),
            float(row["sumsq"] or 0.0),
            index_df.sparkSession.sparkContext.defaultParallelism,
        )
    pts = sum(int(row[f"_p{j}"] or 0) for j in range(len(size_cols)))
    meta["payload_bytes"] = pts * 16 * 3 + int(row["n"] or 0) * 64
    return index_df, meta


def _q(cols: DataFrame, prefix: str) -> DataFrame:
    return cols.select([F.col(c).alias(f"{prefix}{c}") for c in cols.columns])


def grid_candidates(
    index_df: DataFrame,
    queries: DataFrame,
    eps: float,
    meta: dict,
    salt: int | None = None,
) -> DataFrame:
    """J1 equi-join + native F1/F2 predicates. Returns candidate pairs with
    both curves' arrays and an ``accept_f3`` flag (F3 positive filter).

    ``salt``: hot-cell skew handling for sort-merge joins at cluster
    scale (urban corpora concentrate curves in few cells). The dataset
    side adds ``pmod(hash(traj_id), salt)`` to the join key; the query
    side explodes all ``salt`` values, so every (query, curve) pair
    still meets exactly once while a hot cell's rows spread over ``salt``
    shuffle partitions. ``None`` (the default) defers to the data-driven
    ``meta['salt']`` chosen at index-build time from the cell histogram
    (see ``choose_salt``) — the urban-skew split needs no manual flag;
    pass ``0``/``1`` to force the unsalted plan (e.g. when the query
    side broadcasts: no shuffle, no skew)."""
    mesh, corner = meta["mesh"], meta["corner"]
    if salt is None:
        salt = meta.get("salt")
    cx_col, cy_col = _CORNERS[corner]
    qexp = explode_neighbor_cells(
        _q(queries, "q_"), f"q_{cx_col}", f"q_{cy_col}", mesh, eps
    )
    eps_l = F.lit(float(eps))
    eps2 = F.lit(float(eps) * float(eps))
    if salt is not None and salt > 1:
        salted_index = index_df.withColumn(
            "_salt", F.pmod(F.hash("traj_id"), F.lit(salt))
        )
        qexp = qexp.withColumn(
            "_salt", F.explode(F.array(*[F.lit(s) for s in range(salt)]))
        )
        joined = qexp.join(
            salted_index.hint("shuffle_merge"), on=["cell_x", "cell_y", "_salt"]
        ).drop("_salt")
    else:
        joined = qexp.join(index_df, on=["cell_x", "cell_y"])

    # F2: every MBR border within eps (grid.hpp:683-717)
    f2 = (
        (F.abs(F.col("q_min_x") - F.col("min_x")) <= eps_l)
        & (F.abs(F.col("q_max_x") - F.col("max_x")) <= eps_l)
        & (F.abs(F.col("q_min_y") - F.col("min_y")) <= eps_l)
        & (F.abs(F.col("q_max_y") - F.col("max_y")) <= eps_l)
    )
    # F1: endpoint distances (squared, strict > rejects)
    d2_first = (F.col("q_x_first") - F.col("x_first")) ** 2 + (
        F.col("q_y_first") - F.col("y_first")
    ) ** 2
    d2_last = (F.col("q_x_last") - F.col("x_last")) ** 2 + (
        F.col("q_y_last") - F.col("y_last")
    ) ** 2
    f1 = (d2_first <= eps2) & (d2_last <= eps2)

    # F3: farthest possible distance between the two MBRs (grid.hpp:719-730)
    fx = F.greatest(
        F.abs(F.col("q_min_x") - F.col("max_x")),
        F.abs(F.col("q_max_x") - F.col("min_x")),
    )
    fy = F.greatest(
        F.abs(F.col("q_min_y") - F.col("max_y")),
        F.abs(F.col("q_max_y") - F.col("min_y")),
    )
    f3 = (fx * fx + fy * fy) <= eps2

    return joined.filter(f2 & f1).withColumn("accept_f3", f3)


def _simp_funnel_batch(
    rb, eps: float, simp_levels: int, result, stage=None, chunk: int = 4096
):
    """F9 simplification funnel over one Arrow RecordBatch — shared by the
    K5 and CFDQ refine kernels (the reference's bddm engine runs the same
    funnel before EITHER full-resolution decider,
    detail/bddm/spatial_hash.hpp:771-821). Per level i: compare the two
    stored Agarwal simplifications with ETD and the exact decider at
    eps -/+ (simpEps_Q + simpEps_T) — YES below the lower bound, NO above
    the upper bound (exact by the triangle inequality), MAYBE falls
    through. Accepts are written into ``result`` (and ``stage``); returns
    the undecided row indices.

    Rows are size-bucketed and processed in ``chunk``-row padded slices
    (same scheme as decide_pairs_arrow): the padded working set stays
    O(chunk x longest-curve-in-slice) regardless of the Arrow batch size,
    so a wide-curve batch cannot balloon the matrices to batch x max-width."""
    from frechetrange_spark.kernels.batch import (
        _gather_pair,
        _list_buffers,
        decide_frechet_batch,
        etd_batch,
    )

    und = np.arange(rb.num_rows, dtype=np.int64)
    for i in range(simp_levels):
        if und.size == 0:
            break
        q_eps_full = rb.column(f"q_s{i}_eps").to_numpy(zero_copy_only=False)
        t_eps_full = rb.column(f"s{i}_eps").to_numpy(zero_copy_only=False)
        fqx, oqx = _list_buffers(rb.column(f"q_s{i}_xs"))
        fqy, oqy = _list_buffers(rb.column(f"q_s{i}_ys"))
        ftx, otx = _list_buffers(rb.column(f"s{i}_xs"))
        fty, oty = _list_buffers(rb.column(f"s{i}_ys"))
        lens = (oqx[und + 1] - oqx[und]) + (otx[und + 1] - otx[und])
        order = np.argsort(lens, kind="stable")
        remaining = []
        for s in range(0, und.size, chunk):
            rows = und[order[s : s + chunk]]
            sq, st = _gather_pair(fqx, oqx, fqy, oqy, ftx, otx, fty, oty, rows)
            eps_l = eps - q_eps_full[rows] - t_eps_full[rows]
            eps_u = eps + q_eps_full[rows] + t_eps_full[rows]
            d = etd_batch(sq, st)
            yes = d < eps_l  # strict, bddm:792
            todo = np.nonzero(~yes & (eps_l > 0.0))[0]
            if todo.size:
                yes[todo] = decide_frechet_batch(sq[todo], st[todo], eps_l[todo])
            no = np.zeros(rows.size, dtype=bool)
            todo = np.nonzero(~yes & (eps_u > 0.0))[0]
            if todo.size:
                no[todo] = ~decide_frechet_batch(sq[todo], st[todo], eps_u[todo])
            result[rows[yes]] = True
            if stage is not None:
                stage[rows[yes]] = f"simp{i}_yes"
                stage[rows[~yes & no]] = f"simp{i}_no"
            remaining.append(rows[~yes & ~no])
        und = (
            np.concatenate(remaining) if remaining else np.empty(0, dtype=np.int64)
        )
    return und


def _pack_cols(simp_levels: int) -> tuple[list[str], list[str]]:
    """(array columns, eps scalar columns) a curve pack carries."""
    cols = ["xs", "ys"]
    scal = []
    for i in range(simp_levels):
        cols += [f"s{i}_xs", f"s{i}_ys"]
        scal.append(f"s{i}_eps")
    return cols, scal


def _pack_curves(df: DataFrame, simp_levels: int) -> dict:
    """Driver-side pack of a curve table for the broadcast-attach refine:
    every array column as (flat float64, offsets int64) buffers over the
    curves SORTED by traj_id, plus the per-curve simplification eps
    scalars. Only called when the table passed the broadcast-size gate
    (_est_broadcast_bytes <= autoBroadcastJoinThreshold), so the collect
    is bounded by the same budget a broadcast hash join would use."""
    cols, scal = _pack_cols(simp_levels)
    pdf = (
        df.select("traj_id", *cols, *scal).orderBy("traj_id").toPandas()
    )
    ids = pdf["traj_id"].to_numpy(dtype=np.int64)
    packed_cols = {}
    for c in cols:
        vals = pdf[c].to_numpy()
        lens = np.fromiter((len(v) for v in vals), dtype=np.int64, count=len(vals))
        off = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])
        flat = (
            np.concatenate(list(vals)).astype(np.float64, copy=False)
            if len(vals)
            else np.empty(0, dtype=np.float64)
        )
        packed_cols[c] = (flat, off)
    return {
        "ids": ids,
        "cols": packed_cols,
        "scal": {c: pdf[c].to_numpy(dtype=np.float64) for c in scal},
    }


# Broadcast curve packs, cached per (optimized-plan semantic hash,
# simp_levels): repeated queries against the same index reuse ONE
# broadcast instead of re-collecting and re-broadcasting the pack per
# range_query_grid call, and eviction unpersists executor copies so a
# long-lived session issuing many broadcast-attach queries cannot
# accumulate broadcasts without bound.
_PACK_CACHE: dict = {}
# 8 entries: a working set of four concurrent query families, two packs
# each (kNN's checkpoint-keyed packs are new users since r06 — with the
# old cap of 4 they evicted the repeated range_query packs every suite
# round, forcing a re-collect per query). Packs are ~5-15 MB broadcasts;
# eviction unpersists executor copies.
_PACK_CACHE_CAP = 8


def _plan_key(df: DataFrame):
    try:
        return int(df._jdf.queryExecution().optimizedPlan().semanticHash())
    except Exception:
        return id(df)


def _pack_broadcast(df: DataFrame, simp_levels: int):
    """sc.broadcast of _pack_curves(df), LRU-cached (see _PACK_CACHE).

    The cache key is the semantic hash of the PROJECTED plan (just the
    columns the pack reads), so two DataFrames that differ only in
    pack-irrelevant columns — e.g. a self-join's query side (no cell
    columns) vs its index side — share one collected pack instead of
    collecting and broadcasting the same curves twice. Each entry pins a
    reference to its source DataFrame so the id(df) fallback key can
    never alias a garbage-collected plan (a recycled CPython id would
    otherwise serve a stale pack)."""
    cols, scal = _pack_cols(simp_levels)
    proj = df.select("traj_id", *cols, *scal)
    key = (_plan_key(proj), simp_levels)
    hit = _PACK_CACHE.pop(key, None)
    if hit is not None:
        _PACK_CACHE[key] = hit  # LRU refresh
        return hit[0]
    b = df.sparkSession.sparkContext.broadcast(_pack_curves(df, simp_levels))
    _PACK_CACHE[key] = (b, proj)
    while len(_PACK_CACHE) > _PACK_CACHE_CAP:
        _PACK_CACHE.pop(next(iter(_PACK_CACHE)))[0].unpersist(blocking=False)
    return b


def clear_pack_cache(destroy: bool = False) -> None:
    """Release every cached curve-pack broadcast (executor copies always;
    driver values too with ``destroy=True`` — only safe once no lazy
    DataFrame built against them will run again)."""
    while _PACK_CACHE:
        b = _PACK_CACHE.pop(next(iter(_PACK_CACHE)))[0]
        b.destroy() if destroy else b.unpersist(blocking=False)


def _lookup(ids: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Sorted-id -> row-index resolution with a loud miss guard (a miss
    would silently gather another curve's buffers). Degenerate empty
    batches (no candidates to resolve) return an empty index array
    instead of tripping the guard."""
    if vals.size == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.searchsorted(ids, vals)
    if ids.size == 0:
        raise KeyError("broadcast curve pack is missing candidate traj_ids")
    idx = np.minimum(idx, ids.size - 1)
    if not np.array_equal(ids[idx], vals):
        raise KeyError("broadcast curve pack is missing candidate traj_ids")
    return idx


def _simp_funnel_pairs(
    qpack: dict,
    tpack: dict,
    qsel: np.ndarray,
    tsel: np.ndarray,
    eps: float,
    simp_levels: int,
    result,
    stage=None,
    chunk: int = 4096,
):
    """_simp_funnel_batch over broadcast curve packs: identical stage
    semantics, but the simplification arrays are gathered from the shared
    per-curve buffers via qsel/tsel instead of riding the pair rows."""
    from frechetrange_spark.kernels.batch import (
        _padded_gather,
        decide_frechet_batch,
        etd_batch,
    )

    und = np.arange(qsel.size, dtype=np.int64)
    for i in range(simp_levels):
        if und.size == 0:
            break
        fqx, oqx = qpack["cols"][f"s{i}_xs"]
        fqy, oqy = qpack["cols"][f"s{i}_ys"]
        ftx, otx = tpack["cols"][f"s{i}_xs"]
        fty, oty = tpack["cols"][f"s{i}_ys"]
        q_eps_all = qpack["scal"][f"s{i}_eps"]
        t_eps_all = tpack["scal"][f"s{i}_eps"]
        lens = (oqx[qsel[und] + 1] - oqx[qsel[und]]) + (
            otx[tsel[und] + 1] - otx[tsel[und]]
        )
        order = np.argsort(lens, kind="stable")
        remaining = []
        for s in range(0, und.size, chunk):
            rows = und[order[s : s + chunk]]
            qr, tr = qsel[rows], tsel[rows]
            wq = int((oqx[qr + 1] - oqx[qr]).max())
            wt = int((otx[tr + 1] - otx[tr]).max())
            sq = np.stack(
                [_padded_gather(fqx, oqx, qr, wq), _padded_gather(fqy, oqy, qr, wq)],
                axis=-1,
            )
            st = np.stack(
                [_padded_gather(ftx, otx, tr, wt), _padded_gather(fty, oty, tr, wt)],
                axis=-1,
            )
            eps_l = eps - q_eps_all[qr] - t_eps_all[tr]
            eps_u = eps + q_eps_all[qr] + t_eps_all[tr]
            d = etd_batch(sq, st)
            yes = d < eps_l  # strict, bddm:792
            todo = np.nonzero(~yes & (eps_l > 0.0))[0]
            if todo.size:
                yes[todo] = decide_frechet_batch(sq[todo], st[todo], eps_l[todo])
            no = np.zeros(rows.size, dtype=bool)
            todo = np.nonzero(~yes & (eps_u > 0.0))[0]
            if todo.size:
                no[todo] = ~decide_frechet_batch(sq[todo], st[todo], eps_u[todo])
            result[rows[yes]] = True
            if stage is not None:
                stage[rows[yes]] = f"simp{i}_yes"
                stage[rows[~yes & no]] = f"simp{i}_no"
            remaining.append(rows[~yes & ~no])
        und = (
            np.concatenate(remaining) if remaining else np.empty(0, dtype=np.int64)
        )
    return und


def _refine_map(
    eps: float,
    simp_levels: int = 0,
    mirror: bool = False,
    greedy_accept: bool = False,
    neg_reject: bool = False,
    rev_greedy_accept: bool = False,
    dfd_accept: bool = False,
    stats: bool = False,
    bcast=None,
):
    """Arrow-native refine: the exact decider (K5) batched over every pair
    in each RecordBatch — list buffers are gathered into padded (B, N, 2)
    matrices with zero per-row Python objects (see kernels.batch).

    ``greedy_accept``/``neg_reject`` wire the bb filter pack (F4/F5,
    reference order detail/bb/spatial_index.hpp:198-209) into the
    full-resolution stage; result sets are invariant (tested), only cost
    changes. ``stats`` switches the output to one row PER CANDIDATE with
    its funnel stage and verdict — (query_id, traj_id, stage, accepted) —
    for funnel metrics; the default emits accepted pairs only.

    With ``simp_levels > 0`` the bddm simplification funnel (F9,
    detail/bddm/spatial_hash.hpp:771-821) runs first: per level i, compare
    the two stored Agarwal simplifications with ETD and the exact decider
    at eps -/+ (simpEps_Q + simpEps_T); YES below the lower bound, NO above
    the upper bound (exact by the triangle inequality since
    frechet(simp, orig) <= simpEps), MAYBE falls through to the next level
    and finally to the full-resolution ETD accept (F8, :828-840) + decider
    (:846-856). The whole funnel is batched per Arrow batch — no shuffles
    between stages.

    ``SPARK_GRAFT_KERNEL_CHUNK`` (read at plan-build time on the driver)
    overrides the padded-kernel chunk width; the default in
    kernels.batch.decide_pairs_arrow is cache-size-bound, not
    throughput-bound, so the knob exists for measurement, not tuning.

    With ``bcast`` (a (query_side, index_side) pair of attach SPECS) the
    incoming batches carry ONLY (query_id, traj_id) id pairs — every
    curve array and simplification eps is gathered via sorted-id lookup
    from per-side packs instead of riding the pair rows, so the
    candidate join, the repartition shuffle AND the JVM->Python Arrow
    stream all move ~16 bytes per pair instead of the full
    ~(4 x n_points x 8)-byte array payload per pair. Each spec is either
    ``("bcast", broadcast)`` — the whole table packed in one SparkContext
    broadcast (_pack_curves/_pack_broadcast) — or ``("disk", path)`` — a
    co-partitioned curve-pack store (sources/pack_store): the worker
    resolves the batch's unique ids to blocks via the store manifest and
    gathers just those curves from mmapped npy blocks, so the big side
    never transits the driver or a broadcast at all (the over-threshold
    100-TB regime)."""
    chunk = int(os.environ.get("SPARK_GRAFT_KERNEL_CHUNK", "0"))

    def fn(batches):
        import pyarrow as pa

        from frechetrange_spark.kernels.batch import (
            STAGE_NAMES,
            decide_pairs_arrow,
            decide_pairs_buffers,
        )

        def _resolve(spec, ids_arr):
            kind, v = spec
            if kind == "bcast":
                pack = v.value
            else:
                from frechetrange_spark.sources.pack_store import gather_pack

                pack = gather_pack(v, np.unique(ids_arr), simp_levels)
            return pack, _lookup(pack["ids"], ids_arr)

        for rb in batches:
            B = rb.num_rows
            result = np.zeros(B, dtype=bool)
            stage = np.full(B, "", dtype=object) if stats else None
            all_qid = rb.column("query_id").to_numpy(zero_copy_only=False)
            all_tid = rb.column("traj_id").to_numpy(zero_copy_only=False)
            if bcast is not None:
                qpack, qsel = _resolve(bcast[0], all_qid)
                tpack, tsel = _resolve(bcast[1], all_tid)
                und = _simp_funnel_pairs(
                    qpack, tpack, qsel, tsel, eps, simp_levels, result, stage,
                    **({"chunk": chunk} if chunk else {}),
                )
                if und.size:
                    fqx, oqx = qpack["cols"]["xs"]
                    fqy, oqy = qpack["cols"]["ys"]
                    ftx, otx = tpack["cols"]["xs"]
                    fty, oty = tpack["cols"]["ys"]
                    res, codes = decide_pairs_buffers(
                        (fqx, oqx, fqy, oqy),
                        (ftx, otx, fty, oty),
                        qsel[und],
                        tsel[und],
                        eps,
                        greedy_accept=greedy_accept,
                        neg_reject=neg_reject,
                        rev_greedy_accept=rev_greedy_accept,
                        dfd_accept=dfd_accept,
                        return_stages=True,
                        **({"chunk": chunk} if chunk else {}),
                    )
                    result[und] = res
                    if stats:
                        stage[und] = [STAGE_NAMES[c] for c in codes]
            else:
                und = _simp_funnel_batch(
                    rb, eps, simp_levels, result, stage,
                    **({"chunk": chunk} if chunk else {}),
                )
                if und.size:
                    # full-resolution fallback (ETD accept + optional F4/F5)
                    sub = rb.take(pa.array(und))
                    res, codes = decide_pairs_arrow(
                        sub.column("q_xs"),
                        sub.column("q_ys"),
                        sub.column("xs"),
                        sub.column("ys"),
                        eps,
                        greedy_accept=greedy_accept,
                        neg_reject=neg_reject,
                        rev_greedy_accept=rev_greedy_accept,
                        dfd_accept=dfd_accept,
                        return_stages=True,
                        **({"chunk": chunk} if chunk else {}),
                    )
                    result[und] = res
                    if stats:
                        stage[und] = [STAGE_NAMES[c] for c in codes]
            if stats:
                qid, tid, acc = all_qid, all_tid, result
                stg = stage
                if mirror:
                    # mirrored duplicates carry stage='mirror' so per-stage
                    # candidate counts stay one-row-per-candidate while
                    # filter("accepted") still equals the full result set
                    off = (qid != tid) & acc
                    qid = np.concatenate([qid, tid[off]])
                    tid = np.concatenate([tid, all_qid[off]])
                    acc = np.concatenate([acc, acc[off]])
                    stg = np.concatenate(
                        [stg, np.full(int(off.sum()), "mirror", dtype=object)]
                    )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(qid),
                        pa.array(tid),
                        pa.array(list(stg), type=pa.string()),
                        pa.array(acc),
                    ],
                    ["query_id", "traj_id", "stage", "accepted"],
                )
                continue
            idx = np.nonzero(result)[0]
            qid = all_qid[idx]
            tid = all_tid[idx]
            if mirror:
                # symmetric self-join: emit (t, q) for every off-diagonal
                # (q, t) match — Fréchet distance is symmetric
                off = qid != tid
                qid, tid = (
                    np.concatenate([qid, tid[off]]),
                    np.concatenate([tid, qid[off]]),
                )
            yield pa.RecordBatch.from_arrays(
                [pa.array(qid), pa.array(tid)], ["query_id", "traj_id"]
            )

    return fn

REFINE_STATS_SCHEMA = "query_id long, traj_id long, stage string, accepted boolean"


PORTAL_COLS = ("portal_src", "portal_dst", "portal_dist")


def _array_cols(df: DataFrame) -> list[str]:
    """The per-curve array payload columns: xs/ys plus any simplification
    level arrays (s{i}_xs/s{i}_ys) and their eps scalars, plus the CFDQ
    portal columns (unused by the K5 refine — a portal-enriched index in
    broadcast-attach mode must not ship them through the candidate
    join)."""
    out = []
    for c in df.columns:
        if c in ("xs", "ys") or c in PORTAL_COLS:
            out.append(c)
        elif c.startswith("s") and (
            c.endswith("_xs") or c.endswith("_ys") or c.endswith("_eps")
        ):
            out.append(c)
    return out


def _est_broadcast_bytes(df: DataFrame) -> int:
    """Estimated in-memory broadcast size of a curve table's array payload:
    16 bytes per (x, y) point across the full-resolution arrays and every
    stored simplification level (exact: sums the list sizes), times a 3x
    HashedRelation overhead factor, plus per-row slack."""
    aggs = [F.sum(F.size("xs")).alias("p")]
    i = 0
    while f"s{i}_xs" in df.columns:
        aggs.append(F.sum(F.size(f"s{i}_xs")).alias(f"p{i}"))
        i += 1
    aggs.append(F.count("*").alias("n"))
    row = df.agg(*aggs).collect()[0]
    pts = sum(int(row[k] or 0) for k in row.asDict() if k != "n")
    return pts * 16 * 3 + int(row["n"] or 0) * 64


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's own size estimate for the plan (file-size-based for
    parquet scans) — free: no job runs. None when the JVM handle doesn't
    expose stats (e.g. a mocked session)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().longValue()
        )
    except Exception:
        return None


def _payload_bytes_gated(df: DataFrame, thr: int) -> int:
    """_est_broadcast_bytes with a known-large short-circuit: when
    Catalyst's free plan-size estimate already exceeds 8x the broadcast
    threshold, skip the full array-column scan and report the plan size
    (any value > thr suffices — on-disk parquet of incompressible float
    trajectories is ~1/3 the in-memory payload, so 8x leaves a wide
    safety margin against compression). Keeps ``attach='auto'`` from
    paying a full pass over a 100-TB table just to conclude 'shuffle'."""
    plan_bytes = _plan_size_bytes(df)
    if plan_bytes is not None and plan_bytes > 8 * thr:
        return plan_bytes
    return _est_broadcast_bytes(df)


_BYTE_SUFFIXES = {
    "k": 1024,
    "m": 1024**2,
    "g": 1024**3,
    "t": 1024**4,
    "p": 1024**5,
}


def _parse_byte_string(raw: str) -> int:
    """Spark-style byte string: bare bytes or a k/m/g/t/p suffix with an
    optional trailing 'b' (JavaUtils.byteStringAsBytes semantics: '10m',
    '64K', '1gb'), case-insensitive."""
    s = raw.strip().lower()
    mult = 1
    if s.endswith("b") and len(s) > 1 and s[-2] in _BYTE_SUFFIXES:
        s = s[:-1]
    if s and s[-1] in _BYTE_SUFFIXES:
        mult = _BYTE_SUFFIXES[s[-1]]
        s = s[:-1]
    return int(s) * mult


def _broadcast_threshold(spark) -> int:
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "33554432")
    try:
        return max(_parse_byte_string(raw), 0)
    except ValueError:
        return 32 * 1024 * 1024


def range_query_grid(
    index_df: DataFrame,
    queries: DataFrame,
    eps: float,
    meta: dict,
    symmetric: bool = False,
    greedy_accept: bool = True,
    neg_reject: bool = False,
    rev_greedy_accept: bool | None = None,
    dfd_accept: bool | None = None,
    funnel_stats: bool = False,
    observations: dict | None = None,
    attach: str = "auto",
) -> DataFrame:
    """Exact range query via the grid index: (query_id, traj_id) pairs with
    continuous Fréchet distance <= eps.

    ``symmetric=True`` is the self-join fast path (queries == dataset):
    Fréchet distance is symmetric and candidacy after the F1/F2 predicates
    is direction-independent, so only the query_id <= traj_id half is
    refined and matches are mirrored — half the kernel work, identical
    result set (tested).

    ``greedy_accept``/``neg_reject`` toggle the bb F4/F5 filter pack in
    the refine funnel (result-set invariant, tested). Measured at sf0.01
    self-join: F4 accepts ~19% of the pairs reaching the full-resolution
    stage (on by default); F5's galloping reject fires on <2% there while
    costing a scalar pass per undecided pair (off by default — enable for
    reject-heavy workloads). ``funnel_stats=True``
    returns per-candidate funnel rows (query_id, traj_id, stage, accepted)
    instead of match pairs — F3-accepted candidates appear with stage
    'f3_accept'; filter the ``accepted`` column for the match set.

    ``observations``: pass a dict to receive named ``pyspark.sql.
    Observation`` objects ("f3_accepted", "refine_input", "matches") —
    accumulator-backed per-stage row counts collected DURING the job, no
    extra pass over any stage (each observe node sits on a
    single-consumption branch, so counts are exact). Read ``obs.get``
    after an action; the flagship pipeline persists them in the stage
    manifest (north rule: per-partition lineage + metrics).

    ``attach`` picks how the refine kernel's array inputs travel:

    - ``"shuffle"`` — arrays ride the candidate join and the round-robin
      repartition (~4 KB/pair; always valid, never optimal past small
      corpora).
    - ``"broadcast"`` — the candidate join and repartition move ONLY
      (query_id, traj_id) id pairs; both sides' arrays are attached
      inside the kernel from broadcast curve packs. Measured 1.4-2.7x
      faster on the reference's real corpus (128-pt curves: the array
      shuffle was the scaling bottleneck, BENCH.md), identical results
      (tested). Valid while each curve table's array payload fits the
      broadcast threshold.
    - ``"pack"`` — ids-only like broadcast, but the dataset side's
      arrays come from the co-partitioned on-disk curve-pack store
      written next to the index (meta['pack_path'], see
      sources/pack_store + write_index(pack=True)): each executor
      mmap-gathers only the curves its candidate batches touch — the
      scale arm for tables PAST the broadcast threshold, where
      "shuffle" would pay ~4 KB/pair and "broadcast" can't hold the
      table. The query side still broadcasts when it fits (the common
      big-data/bounded-queries shape) and falls back to the same store
      for the self-join shape.
    - ``"auto"`` (default) — broadcast when BOTH sides' estimated array
      payload (build-time meta['payload_bytes'] for the index side —
      no per-query scan — with _est_broadcast_bytes/plan-stats gating
      for the query side) fits spark.sql.autoBroadcastJoinThreshold;
      else pack when the index carries a pack store; else shuffle."""
    from pyspark.sql import Observation

    # r06 upper-bound accept filters (reversed greedy + discrete-Fréchet,
    # see kernels.batch.decide_pairs_buffers): result-set invariant sound
    # YES-provers (tested) that cut the exact decider's input ~3x.
    # Defaulted OFF under funnel_stats so the graded per-stage taxonomy
    # (stage strings + counts) stays byte-stable across rounds — their
    # effectiveness is documented in OPTIMIZATION_r06.md instead; pass the
    # flags explicitly to see their stages in a stats run.
    if rev_greedy_accept is None:
        rev_greedy_accept = not funnel_stats
    if dfd_accept is None:
        dfd_accept = not funnel_stats

    spark = index_df.sparkSession
    if attach == "auto":
        thr = _broadcast_threshold(spark)
        attach = "shuffle"
        if thr > 0:
            # the index side's payload estimate is computed ONCE at build
            # time and carried in meta (like salt) — the auto gate must
            # not re-scan the array columns of a 100-TB table per query
            d_bytes = meta.get("payload_bytes")
            if d_bytes is None:
                d_bytes = _payload_bytes_gated(index_df, thr)
            if d_bytes <= thr and _payload_bytes_gated(queries, thr) <= thr:
                attach = "broadcast"
            elif meta.get("pack_path"):
                attach = "pack"
    # funnel columns (Agarwal simplifications) ride along when the index
    # was enriched on BOTH sides
    simp_levels = 0
    extra = []
    while (
        f"s{simp_levels}_eps" in index_df.columns
        and f"s{simp_levels}_eps" in queries.columns
    ):
        extra += [
            f"q_s{simp_levels}_xs",
            f"q_s{simp_levels}_ys",
            f"q_s{simp_levels}_eps",
            f"s{simp_levels}_xs",
            f"s{simp_levels}_ys",
            f"s{simp_levels}_eps",
        ]
        simp_levels += 1

    ids_only = attach in ("broadcast", "pack")
    if ids_only:
        # candidates over scalar features only — no array bytes enter the
        # join or the repartition
        drop_d = [c for c in _array_cols(index_df) if not c.endswith("_eps")]
        drop_q = [c for c in _array_cols(queries) if not c.endswith("_eps")]
        cand = grid_candidates(
            index_df.drop(*drop_d), queries.drop(*drop_q), eps, meta
        )
    else:
        cand = grid_candidates(index_df, queries, eps, meta)
    accepted = cand.filter("accept_f3").select(
        F.col("q_traj_id").alias("query_id"), "traj_id"
    )
    if observations is not None and not funnel_stats:
        observations["f3_accepted"] = Observation()
        accepted = accepted.observe(
            observations["f3_accepted"], F.count(F.lit(1)).alias("n")
        )
    if funnel_stats:
        accepted = accepted.select(
            "query_id",
            "traj_id",
            F.lit("f3_accept").alias("stage"),
            F.lit(True).alias("accepted"),
        )
    refine_cols = [
        "query_id",
        "traj_id",
        F.col("q_xs"),
        F.col("q_ys"),
        "xs",
        "ys",
        *[F.col(c) for c in extra],
    ]
    # Round-robin repartition before the Arrow kernel: the refine input is
    # small in BYTES but heavy in per-row CPU (free-space DP), so AQE's
    # byte-based coalescing would funnel it into one task. Explicit
    # repartition(n) is exempt from AQE coalescing and balances pair costs.
    n_slots = 2 * spark.sparkContext.defaultParallelism
    refine_bcast = None
    if ids_only:
        ids = cand.filter(~F.col("accept_f3")).select(
            F.col("q_traj_id").alias("query_id"), "traj_id"
        )
        if symmetric:
            ids = ids.filter(F.col("query_id") <= F.col("traj_id"))
        if observations is not None and not funnel_stats:
            observations["refine_input"] = Observation()
            ids = ids.observe(
                observations["refine_input"], F.count(F.lit(1)).alias("n")
            )
        # ids-only all the way INTO the kernel: the curve arrays (and
        # simplification levels) travel once per executor — as a python
        # broadcast of packed buffers, or gathered from the mmapped
        # curve-pack store — not once per candidate pair: the join, the
        # repartition and the JVM->Python Arrow stream each move ~16
        # bytes/pair instead of the ~4 KB/pair array payload. Broadcast
        # packs are LRU-cached per table (_pack_broadcast): repeated
        # queries reuse one broadcast, eviction unpersists executor
        # copies.
        if attach == "pack":
            pack_path = meta.get("pack_path")
            if not pack_path:
                raise ValueError(
                    "attach='pack' needs meta['pack_path'] — write the "
                    "index with write_index(..., pack=True) or call "
                    "pack_store.write_pack and set meta['pack_path']"
                )
            t_spec = ("disk", pack_path)
            # query side: broadcast-pack when it fits (the common 100-TB
            # shape: huge dataset, bounded query set); otherwise gather
            # from a disk pack — the INDEX's own store only for the
            # self-join shape (symmetric=True: queries ARE the indexed
            # curves) or an explicit meta['query_pack_path']. A foreign
            # over-threshold query table must NOT silently reuse the
            # index store: overlapping traj_id spaces would gather the
            # WRONG curves for the query side and return silently wrong
            # results (only ids absent from the store trip the loud
            # _lookup KeyError) — raise instead.
            thr = _broadcast_threshold(spark)
            if thr > 0 and _payload_bytes_gated(queries, thr) <= thr:
                q_spec = ("bcast", _pack_broadcast(queries, simp_levels))
            elif symmetric:
                q_spec = ("disk", pack_path)
            elif meta.get("query_pack_path"):
                q_spec = ("disk", meta["query_pack_path"])
            else:
                raise ValueError(
                    "attach='pack' with an over-broadcast-threshold query "
                    "table: reusing the index's pack store is only exact "
                    "for the self-join shape (symmetric=True). Write a "
                    "pack for the query table (pack_store.write_pack) and "
                    "set meta['query_pack_path'], or raise the broadcast "
                    "threshold."
                )
            refine_bcast = (q_spec, t_spec)
        else:
            refine_bcast = (
                ("bcast", _pack_broadcast(queries, simp_levels)),
                ("bcast", _pack_broadcast(index_df, simp_levels)),
            )
        to_refine = ids.repartition(n_slots)
    else:
        to_refine = cand.filter(~F.col("accept_f3")).select(
            F.col("q_traj_id").alias("query_id"), "traj_id", *refine_cols[2:]
        )
        if symmetric:
            to_refine = to_refine.filter(F.col("query_id") <= F.col("traj_id"))
        if observations is not None and not funnel_stats:
            observations["refine_input"] = Observation()
            to_refine = to_refine.observe(
                observations["refine_input"], F.count(F.lit(1)).alias("n")
            )
        to_refine = to_refine.repartition(n_slots)
    refined = to_refine.mapInArrow(
        _refine_map(
            eps,
            simp_levels,
            mirror=symmetric,
            greedy_accept=greedy_accept,
            neg_reject=neg_reject,
            rev_greedy_accept=rev_greedy_accept,
            dfd_accept=dfd_accept,
            stats=funnel_stats,
            bcast=refine_bcast,
        ),
        schema=REFINE_STATS_SCHEMA if funnel_stats else "query_id long, traj_id long",
    )
    result = accepted.unionAll(refined)
    if observations is not None and not funnel_stats:
        observations["matches"] = Observation()
        result = result.observe(
            observations["matches"], F.count(F.lit(1)).alias("n")
        )
    return result


def _cfdq_refine_map(eps: float, simp_levels: int = 0):
    """Refine kernel for the CFDQ engine: the batched F9 simplification
    funnel first (shared with the K5 path — the reference's bddm engine
    runs the funnel before its full-resolution decide too,
    spatial_hash.hpp:771-856), then the CFDQ sparse decider (K6) with the
    dataset curve's stored portals (K9/O4, columns portal_src/dst/dist)
    on the few funnel survivors. CFDQ's sparse interval walk is
    control-flow-heavy and stays scalar per pair, but it now sees only
    funnel MAYBEs instead of every candidate; the per-survivor portals
    are passed as flat (srcs, dsts, dists) slices of the Arrow buffers
    (the columns are written src-sorted, dst-sorted within src — see
    enrich_with_portals/compile_portals) and the kernel finds each row's
    group with np.searchsorted — zero per-pair Python object churn."""

    def fn(batches):
        import pyarrow as pa

        from frechetrange_spark.kernels.batch import _list_buffers
        from frechetrange_spark.kernels.cfdq import decide_frechet_cfdq

        for rb in batches:
            B = rb.num_rows
            res = np.zeros(B, dtype=bool)
            und = _simp_funnel_batch(rb, eps, simp_levels, res)
            if und.size:
                fqx, oqx = _list_buffers(rb.column("q_xs"))
                fqy, oqy = _list_buffers(rb.column("q_ys"))
                ftx, otx = _list_buffers(rb.column("xs"))
                fty, oty = _list_buffers(rb.column("ys"))
                fps, ops = _list_buffers(rb.column("portal_src"))
                fpd, opd = _list_buffers(rb.column("portal_dst"))
                fpw, opw = _list_buffers(rb.column("portal_dist"))
                fps = fps.astype(np.int64, copy=False)
                fpd = fpd.astype(np.int64, copy=False)
                for r in und:
                    q = np.column_stack(
                        [fqx[oqx[r] : oqx[r + 1]], fqy[oqy[r] : oqy[r + 1]]]
                    )
                    t = np.column_stack(
                        [ftx[otx[r] : otx[r + 1]], fty[oty[r] : oty[r + 1]]]
                    )
                    # the stored columns are src-sorted with dst ascending
                    # inside each src group (compile_portals/O4), exactly
                    # the kernel's flat interface: slice the Arrow buffers
                    # and hand them over — zero per-pair Python objects
                    portals = (
                        fps[ops[r] : ops[r + 1]],
                        fpd[opd[r] : opd[r + 1]],
                        fpw[opw[r] : opw[r + 1]],
                    )
                    # portals attach to the dataset curve -> CFDQ's p side
                    res[r] = decide_frechet_cfdq(
                        t, q, eps, base_query_delta=eps, portals=portals
                    )
            idx = np.nonzero(res)[0]
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("query_id").take(pa.array(idx)),
                    rb.column("traj_id").take(pa.array(idx)),
                ],
                ["query_id", "traj_id"],
            )

    return fn


def range_query_cfdq(
    index_df: DataFrame, queries: DataFrame, eps: float, meta: dict
) -> DataFrame:
    """Exact range query refining with the CFDQ sparse decider over stored
    index portals — the bddm 'tue' engine lifecycle end-to-end (SURVEY
    §3.3): J1 candidates -> F1/F2/F3 native filters -> batched F9
    simplification funnel (when both sides carry s{i} columns) -> K6 +
    portals on the funnel survivors, mirroring the reference's own
    funnel-then-decide order (spatial_hash.hpp:771-856). ``index_df``
    must carry the portal columns (enrich_with_portals). Result sets
    equal the K5 funnel's (parity-tested); offered as an alternative
    engine — the batched K5 funnel stays the default."""
    for c in ("portal_src", "portal_dst", "portal_dist"):
        if c not in index_df.columns:
            raise ValueError(f"index is missing portal column {c}; "
                             "run enrich_with_portals at build time")
    cand = grid_candidates(index_df, queries, eps, meta)
    accepted = cand.filter("accept_f3").select(
        F.col("q_traj_id").alias("query_id"), "traj_id"
    )
    simp_levels = 0
    extra = []
    while (
        f"s{simp_levels}_eps" in cand.columns
        and f"q_s{simp_levels}_eps" in cand.columns
    ):
        extra += [
            f"q_s{simp_levels}_xs",
            f"q_s{simp_levels}_ys",
            f"q_s{simp_levels}_eps",
            f"s{simp_levels}_xs",
            f"s{simp_levels}_ys",
            f"s{simp_levels}_eps",
        ]
        simp_levels += 1
    to_refine = cand.filter(~F.col("accept_f3")).select(
        F.col("q_traj_id").alias("query_id"),
        "traj_id",
        F.col("q_xs"),
        F.col("q_ys"),
        "xs",
        "ys",
        "portal_src",
        "portal_dst",
        "portal_dist",
        *[F.col(c) for c in extra],
    )
    n_slots = 2 * index_df.sparkSession.sparkContext.defaultParallelism
    refined = to_refine.repartition(n_slots).mapInArrow(
        _cfdq_refine_map(eps, simp_levels), schema="query_id long, traj_id long"
    )
    return accepted.unionAll(refined)


def range_query_bruteforce(
    curves: DataFrame, queries: DataFrame, eps: float
) -> DataFrame:
    """Ground-truth oracle: decide every (query, trajectory) pair with the
    exact kernel. No filters beyond what the decider itself implies."""
    pairs = _q(
        queries.select("traj_id", "xs", "ys"), "q_"
    ).crossJoin(curves.select("traj_id", "xs", "ys"))
    pairs = pairs.select(
        F.col("q_traj_id").alias("query_id"), "traj_id", "q_xs", "q_ys", "xs", "ys"
    )

    n_slots = 2 * curves.sparkSession.sparkContext.defaultParallelism
    return pairs.repartition(n_slots).mapInArrow(
        _refine_map(eps), schema="query_id long, traj_id long"
    )
