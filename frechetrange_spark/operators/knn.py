"""kNN by Fréchet distance (north-rule extension; the reference has no
top-k — SURVEY §2.5 O5).

Single-pass bound-and-prune algorithm (no driver iteration). Ranking is
exact up to the distance kernel's 1e-6 *relative* bisection tolerance
(the reference's own benchmark tolerance, benchmark/benchmark.py): two
candidates whose true distances differ by less than ~2e-6 relative may
swap ranks; every pruning step below is tolerance-free (sound bounds).

1. **Scalar bound pass** — broadcast the query curves' scalar features
   (MBR + endpoints, ~10 doubles) against the dataset's: per pair compute
   a cheap upper bound UB (farthest possible point-pair distance between
   the two MBRs, the F3 quantity of detail/dv/grid.hpp:719-730 — any
   matching is pointwise below it, so δF <= UB) and a lower bound LB
   (max of start/start and end/end distances — endpoints must match
   endpoints — and the per-axis MBR border gaps |Δmin|/|Δmax|, each a
   1-D projection of δF; cf. the F1/F2 filter quantities,
   dv/frechet_distance.hpp:44-47, dv/grid.hpp:683-717).
2. **Radius** — per query, U_k = k-th smallest UB (self excluded). At
   least k curves have δF <= U_k, so every true k-nearest neighbor has
   δF <= U_k and hence LB <= U_k: pairs with LB > U_k cannot be in the
   answer and are pruned without touching any array data.
3. **Refine** — join the surviving pairs with both curves' arrays and
   compute the exact distance (bisection over the free-space decider,
   K12, already bracketed by endpoint-LB / equal-time-UB inside the
   kernel), then rank with a window and keep the top k.

Everything is one relational plan + one Arrow kernel pass; there is no
per-round driver loop, so the serial fraction is a single window
aggregate over scalar rows. The scalar cross join broadcasts the query
side, so at cluster scale it is a map-only stage over the (partitioned)
dataset features."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _distance_kernel(batches):
    import pyarrow as pa

    from frechetrange_spark.kernels.batch import distance_pairs_arrow

    for rb in batches:
        # 1e-6 relative tolerance = the reference's own kNN-style
        # bisection (benchmark/test.py:96, eps=1E-6); ranks are stable
        # well above it and it saves ~10 of ~37 decide sweeps per pair
        dists = distance_pairs_arrow(
            rb.column("q_xs"),
            rb.column("q_ys"),
            rb.column("xs"),
            rb.column("ys"),
            rel_tol=1e-6,
        )
        yield pa.RecordBatch.from_arrays(
            [rb.column("query_id"), rb.column("traj_id"), pa.array(dists)],
            ["query_id", "traj_id", "distance"],
        )


def frechet_distances(pairs: DataFrame) -> DataFrame:
    """(query_id, traj_id, distance) for pair rows carrying q_xs/q_ys/xs/ys.

    Round-robin repartition before the kernel: pair rows are cheap in bytes
    but expensive in CPU, so byte-based AQE coalescing must not funnel them
    into few tasks."""
    n_slots = 2 * pairs.sparkSession.sparkContext.defaultParallelism
    return pairs.repartition(n_slots).mapInArrow(
        _distance_kernel, schema="query_id long, traj_id long, distance double"
    )


_FEATS = [
    "x_first",
    "y_first",
    "x_last",
    "y_last",
    "min_x",
    "max_x",
    "min_y",
    "max_y",
]


def _ub_col():
    """UB: farthest possible point-pair distance between the MBRs (the F3
    quantity, detail/dv/grid.hpp:719-730) — any matching is pointwise
    below it, so δF <= UB."""
    fx = F.greatest(
        F.abs(F.col("q_min_x") - F.col("max_x")),
        F.abs(F.col("q_max_x") - F.col("min_x")),
    )
    fy = F.greatest(
        F.abs(F.col("q_min_y") - F.col("max_y")),
        F.abs(F.col("q_max_y") - F.col("min_y")),
    )
    return F.sqrt(fx * fx + fy * fy)


def _lb_col():
    """LB: endpoint distances (endpoints must match endpoints) and
    per-axis MBR border gaps — each a 1-D projection of δF (cf. the F1/F2
    filter quantities, dv/frechet_distance.hpp:44-47, grid.hpp:683-717)."""
    d_first = F.sqrt(
        (F.col("q_x_first") - F.col("x_first")) ** 2
        + (F.col("q_y_first") - F.col("y_first")) ** 2
    )
    d_last = F.sqrt(
        (F.col("q_x_last") - F.col("x_last")) ** 2
        + (F.col("q_y_last") - F.col("y_last")) ** 2
    )
    return F.greatest(
        F.abs(F.col("q_min_x") - F.col("min_x")),
        F.abs(F.col("q_max_x") - F.col("max_x")),
        F.abs(F.col("q_min_y") - F.col("min_y")),
        F.abs(F.col("q_max_y") - F.col("max_y")),
        d_first,
        d_last,
    )


def _radius_prune(bounded: DataFrame, k: int) -> DataFrame:
    """Step 2: per query, U_k = k-th smallest UB. At least k curves have
    δF <= U_k, so every true k-nearest neighbor has δF <= U_k and hence
    LB <= U_k: pairs with LB > U_k are pruned. If a query has < k pairs,
    keep them all.

    One-pass plan (r06): U_k and the pair count come from a second window
    over the SAME partitioning instead of a groupBy + broadcast join —
    the old shape evaluated ``bounded`` twice (once under the window,
    once as the join probe) and paid a broadcast-build job; this shape
    computes it once behind a single exchange. Identical keep set (the
    k-th smallest UB value does not depend on the row_number tie
    order)."""
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("ub").asc(), F.col("traj_id").asc()
    )
    w_all = Window.partitionBy("query_id")
    return (
        bounded.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn(
            "_radius", F.max(F.when(F.col("_rk") <= k, F.col("ub"))).over(w_all)
        )
        .withColumn("_np", F.count(F.lit(1)).over(w_all))
        .filter((F.col("_np") <= k) | (F.col("lb") <= F.col("_radius")))
        .select("query_id", "traj_id")
    )


def knn_candidates(curves: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """Steps 1-2 over ALL pairs: (query_id, traj_id) pairs that can be in
    the exact top-k by Fréchet distance — scalar bounds only, no array
    data moved. O(N·Q) scalar rows: fine for moderate query batches; use
    ``knn_candidates_grid`` for the sublinear cell-prefiltered variant."""
    t = curves.select(F.col("traj_id"), *[F.col(c) for c in _FEATS])
    q = queries.select(
        F.col("traj_id").alias("query_id"),
        *[F.col(c).alias(f"q_{c}") for c in _FEATS],
    )
    pairs = t.join(F.broadcast(q), F.col("traj_id") != F.col("query_id"))
    bounded = pairs.select(
        "query_id", "traj_id", _lb_col().alias("lb"), _ub_col().alias("ub")
    )
    return _radius_prune(bounded, k)


def knn_candidates_grid(
    curves: DataFrame, queries: DataFrame, k: int, mesh: float
) -> DataFrame:
    """Steps 1-2 with a grid prefilter (SURVEY O5 at scale): instead of
    scoring every (query, curve) pair, probe the home-cell grid with an
    expanding Chebyshev ring — the candidate stream is sublinear in N on
    clustered corpora (tested) while the returned set still provably
    contains the exact top-k.

    Soundness chain (exact, no tuning):
    1. Home cells: each curve keyed by floor(min-corner / mesh) — the J1
       grid convention (grid.hpp:352-358). For home cells at Chebyshev
       cell distance g >= 1, the min-corner coordinates differ by
       > (g-1)·mesh on some axis, and |Δmin_x|, |Δmin_y| are both LB
       terms, so LB > (g-1)·mesh.
    2. Ring radius r_q = smallest g whose cumulative occupied-cell count
       reaches k+1 (per query, over the tiny broadcast cell histogram —
       +1 absorbs the query itself). U'_k = k-th smallest UB among the
       non-self ring pairs. Rings < r_q hold at most k-1 non-self curves
       (else r_q would be smaller), so at least one of the k smallest-UB
       ring curves sits at ring exactly r_q, and U'_k >= its UB >= its
       LB > (r_q-1)·mesh.
    3. Any true top-k member m has δF(m) <= U'_k (>= k ring curves have
       δF <= UB <= U'_k), hence LB(m) <= U'_k, hence by (1) its home
       cell lies within g_max = floor(U'_k/mesh) + 2 (+2: one ring of
       slack absorbs the float division, keeping the bound strict).
    4. The final candidate set = all curves with g <= g_max, re-pruned by
       the standard U_k/LB radius logic (_radius_prune) — a superset of
       the ring set, so its k-th smallest UB <= U'_k and the prune stays
       sound. Identical top-k to the all-pairs variant (tested).

    Cost: the per-(query, occupied-cell) scalar product replaces the
    per-(query, curve) product — on a corpus with C cells << N curves the
    planning stage is O(Q·C) and only cells inside g_max fan out rows."""
    from frechetrange_spark.operators.tiling import cell_coord

    homed = curves.select(F.col("traj_id"), *[F.col(c) for c in _FEATS]).withColumn(
        "cell_x", cell_coord(F.col("min_x"), mesh)
    ).withColumn("cell_y", cell_coord(F.col("min_y"), mesh))
    spark = curves.sparkSession
    # Ring PLANNING runs on the driver (r06): its two inputs are bounded
    # — the occupied-cell histogram (an index statistic of the same
    # family choose_corner/choose_salt already collect; #cells << N) and
    # the per-query scalar features (the bounded query workload, which
    # the refine stage collects into a broadcast pack anyway). The old
    # all-relational planning DAG (crossJoin + window + three
    # localCheckpoints + five broadcast builds) cost 18 Spark jobs of
    # sub-second tiny-data work per call; this shape costs 2 collects +
    # 1 aggregate, and the DATA-scale work (the two homed probes and the
    # scalar radius prune) stays relational and map-only. Every float
    # expression is replicated exactly (same IEEE ops), so the candidate
    # set is identical (pinned by the grid==all-pairs parity test).
    cell_rows = (
        homed.groupBy("cell_x", "cell_y").agg(F.count("*").alias("cnt")).collect()
    )
    ccx = np.array([r["cell_x"] for r in cell_rows], dtype=np.int64)
    ccy = np.array([r["cell_y"] for r in cell_rows], dtype=np.int64)
    ccnt = np.array([r["cnt"] for r in cell_rows], dtype=np.int64)
    q_rows = queries.select(F.col("traj_id"), *[F.col(c) for c in _FEATS]).collect()
    if not cell_rows or not q_rows:
        return curves.sparkSession.createDataFrame(
            [], "query_id long, traj_id long"
        )
    qid = np.array([r["traj_id"] for r in q_rows], dtype=np.int64)
    qfe = {c: np.array([r[c] for r in q_rows], dtype=np.float64) for c in _FEATS}
    qcx = np.floor(qfe["min_x"] / float(mesh)).astype(np.int64)
    qcy = np.floor(qfe["min_y"] / float(mesh)).astype(np.int64)
    # per (query, occupied cell): Chebyshev ring distance g; rq = smallest
    # g whose cumulative count reaches k+1 (fallback: the farthest ring)
    g = np.maximum(
        np.abs(qcx[:, None] - ccx[None, :]), np.abs(qcy[:, None] - ccy[None, :])
    )  # (Q, C)
    order = np.argsort(g, axis=1, kind="stable")
    g_sorted = np.take_along_axis(g, order, axis=1)
    cum = np.cumsum(np.take_along_axis(np.broadcast_to(ccnt, g.shape), order, axis=1), axis=1)
    reach = cum >= k + 1
    first = np.argmax(reach, axis=1)
    g_all = g_sorted[:, -1]
    rq = np.where(reach.any(axis=1), g_sorted[np.arange(len(qid)), first], g_all)

    def _probe_df(mask: np.ndarray):
        """(query_id, q-features, cell_x, cell_y) rows for the masked
        (query, cell) pairs — the tiny broadcast probe side."""
        qi, ci = np.nonzero(mask)
        data = {"query_id": qid[qi]}
        for c in _FEATS:
            data[f"q_{c}"] = qfe[c][qi]
        data["cell_x"] = ccx[ci]
        data["cell_y"] = ccy[ci]
        import pandas as pd

        schema = "query_id long, " + ", ".join(
            f"q_{c} double" for c in _FEATS
        ) + ", cell_x long, cell_y long"
        return spark.createDataFrame(pd.DataFrame(data), schema=schema)

    # ring pairs: curves homed within r_q — enough to bound the k-th
    # smallest UB per query; the probe side is tiny and BROADCAST, so the
    # join is a map-only hash probe over the curves — never a shuffle
    # keyed by (hot) cells.
    ring = (
        homed.join(F.broadcast(_probe_df(g <= rq[:, None])), ["cell_x", "cell_y"])
        .filter(F.col("traj_id") != F.col("query_id"))
        .select("query_id", "traj_id", _ub_col().alias("ub"))
    )
    uk_rows = (
        ring.groupBy("query_id")
        .agg(
            F.try_element_at(F.array_sort(F.collect_list("ub")), F.lit(k)).alias(
                "uprime"
            ),
            F.count("*").alias("n_ring"),
        )
        .collect()
    )
    # g_max per query: floor(U'_k/mesh) + 2; a query with < k non-self
    # ring pairs (tiny corpus) falls back to every occupied cell
    g_max = g_all.copy()
    pos = {int(i): n for n, i in enumerate(qid)}
    for r in uk_rows:
        if r["n_ring"] >= k:
            g_max[pos[int(r["query_id"])]] = (
                np.floor(float(r["uprime"]) / float(mesh)) + 2
            )
    cand = homed.join(
        F.broadcast(_probe_df(g <= g_max[:, None])), ["cell_x", "cell_y"]
    ).filter(F.col("traj_id") != F.col("query_id"))
    bounded = cand.select(
        "query_id", "traj_id", _lb_col().alias("lb"), _ub_col().alias("ub")
    )
    return _radius_prune(bounded, k)


def _etd_kernel(batches):
    """Batched ETD + endpoint lower bound per pair — padded-gather path
    (kernels.batch), no per-row Python objects."""
    import pyarrow as pa

    from frechetrange_spark.kernels.batch import _list_buffers, etd_pairs_arrow

    for rb in batches:
        fqx, oqx = _list_buffers(rb.column("q_xs"))
        fqy, oqy = _list_buffers(rb.column("q_ys"))
        ftx, otx = _list_buffers(rb.column("xs"))
        fty, oty = _list_buffers(rb.column("ys"))
        B = len(oqx) - 1
        etd = etd_pairs_arrow(
            rb.column("q_xs"), rb.column("q_ys"), rb.column("xs"), rb.column("ys")
        )
        rows = np.arange(B)
        lbs = np.maximum(
            np.hypot(
                fqx[oqx[rows]] - ftx[otx[rows]], fqy[oqy[rows]] - fty[oty[rows]]
            ),
            np.hypot(
                fqx[oqx[rows + 1] - 1] - ftx[otx[rows + 1] - 1],
                fqy[oqy[rows + 1] - 1] - fty[oty[rows + 1] - 1],
            ),
        )
        yield pa.RecordBatch.from_arrays(
            [
                rb.column("query_id"),
                rb.column("traj_id"),
                pa.array(lbs),
                pa.array(etd),
            ],
            ["query_id", "traj_id", "lb", "etd"],
        )


def _etd_radius_prune(bounds: DataFrame, k: int) -> DataFrame:
    """Window-only ETD radius prune over (query_id, traj_id, lb, etd)
    rows: radius = k-th smallest ETD per query; drop pairs with lb >
    radius (keep all when a query has <= k pairs). Same shape as
    ``_radius_prune`` — one exchange, the ETD kernel upstream runs ONCE
    (the old groupBy + broadcast-join shape evaluated the kernel twice:
    once under the rank window, once as the join probe)."""
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("etd").asc(), F.col("traj_id").asc()
    )
    w_all = Window.partitionBy("query_id")
    return (
        bounds.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn(
            "radius", F.max(F.when(F.col("_rk") <= k, F.col("etd"))).over(w_all)
        )
        .withColumn("_np", F.count(F.lit(1)).over(w_all))
        .filter((F.col("_np") <= k) | (F.col("lb") <= F.col("radius")))
        .select("query_id", "traj_id", "radius")
    )


def etd_prune(curves: DataFrame, queries: DataFrame, candidates: DataFrame, k: int) -> DataFrame:
    """Step 2b: tighten the candidate set with the equal-time distance
    (F8, detail/bddm/spatial_hash.hpp:253-362 — a linear-time upper bound
    ~3000x cheaper than the bisection decider). Per query the k-th smallest
    ETD is a valid radius: >= k curves have δF <= it, so pairs whose
    endpoint lower bound exceeds it cannot be in the top k.

    Returns (query_id, traj_id, radius) — the radius rides along so the
    decide-at-radius prune (step 2c) can run without recomputing ETDs."""
    pairs = _pairs_with_arrays(curves, queries, candidates)
    n_slots = 2 * pairs.sparkSession.sparkContext.defaultParallelism
    bounds = pairs.repartition(n_slots).mapInArrow(
        _etd_kernel, schema="query_id long, traj_id long, lb double, etd double"
    )
    return _etd_radius_prune(bounds, k)


def _pack_bufs(pack: dict) -> tuple:
    """(flat_x, off_x, flat_y, off_y) of a broadcast curve pack."""
    fx, ox = pack["cols"]["xs"]
    fy, oy = pack["cols"]["ys"]
    return (fx, ox, fy, oy)


def _etd_kernel_pack(qb, tb):
    """ETD + endpoint lower bound per id pair, arrays gathered from
    broadcast curve packs (ids-only attach: the candidate stream and the
    repartition shuffle carry 16 B/pair instead of the array payload —
    same pattern as range_query's broadcast attach)."""

    def kernel(batches):
        import pyarrow as pa

        from frechetrange_spark.kernels.batch import etd_pairs_buffers
        from frechetrange_spark.operators.range_query import _lookup

        qpack, tpack = qb.value, tb.value
        bq, bt = _pack_bufs(qpack), _pack_bufs(tpack)
        fqx, oqx, fqy, oqy = bq
        ftx, otx, fty, oty = bt
        for rb in batches:
            qid = rb.column("query_id").to_numpy(zero_copy_only=False)
            tid = rb.column("traj_id").to_numpy(zero_copy_only=False)
            qsel = _lookup(qpack["ids"], qid)
            tsel = _lookup(tpack["ids"], tid)
            etd = etd_pairs_buffers(bq, bt, qsel, tsel)
            lbs = np.maximum(
                np.hypot(
                    fqx[oqx[qsel]] - ftx[otx[tsel]],
                    fqy[oqy[qsel]] - fty[oty[tsel]],
                ),
                np.hypot(
                    fqx[oqx[qsel + 1] - 1] - ftx[otx[tsel + 1] - 1],
                    fqy[oqy[qsel + 1] - 1] - fty[oty[tsel + 1] - 1],
                ),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("query_id"),
                    rb.column("traj_id"),
                    pa.array(lbs),
                    pa.array(etd),
                ],
                ["query_id", "traj_id", "lb", "etd"],
            )

    return kernel


def _decide_distance_map(qb, tb, rel_tol: float = 1e-6):
    """Fused step 2c + 3 over broadcast curve packs: ONE kernel pass that
    (a) decides each surviving pair at its per-query radius (the k-th
    smallest ETD, widened by 1e-12 relative exactly like
    ``_decide_radius_kernel`` — see that docstring for the boundary
    analysis) and (b) runs the bisection distance only on the accepted
    pairs — the old plan shipped the decide survivors through another
    join + repartition + Arrow pass before the distance kernel. Per-pair
    results are independent of batch composition, so the distances equal
    the unfused path bit-for-bit."""

    def kernel(batches):
        import pyarrow as pa

        from frechetrange_spark.kernels.batch import (
            decide_pairs_buffers,
            distance_pairs_buffers,
        )
        from frechetrange_spark.operators.range_query import _lookup

        qpack, tpack = qb.value, tb.value
        bq, bt = _pack_bufs(qpack), _pack_bufs(tpack)
        for rb in batches:
            qid = rb.column("query_id").to_numpy(zero_copy_only=False)
            tid = rb.column("traj_id").to_numpy(zero_copy_only=False)
            qsel = _lookup(qpack["ids"], qid)
            tsel = _lookup(tpack["ids"], tid)
            radius = rb.column("radius").to_numpy(zero_copy_only=False)
            eps = np.nextafter(radius * (1.0 + 1e-12), np.inf)
            keep = decide_pairs_buffers(bq, bt, qsel, tsel, eps)
            idx = np.nonzero(keep)[0]
            dists = distance_pairs_buffers(
                bq, bt, qsel[idx], tsel[idx], rel_tol=rel_tol
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qid[idx]),
                    pa.array(tid[idx]),
                    pa.array(dists),
                ],
                ["query_id", "traj_id", "distance"],
            )

    return kernel


def _decide_radius_kernel(batches):
    """Batched single decision per pair at its per-row radius column."""
    import pyarrow as pa

    from frechetrange_spark.kernels.batch import decide_pairs_arrow

    for rb in batches:
        # Decide at radius*(1+1e-12), not at the radius itself: the radius
        # is a k-th smallest ETD, i.e. sqrt(max d2), and eps*eps can round
        # a few ulps below that d2 — the bare decider then rejects pairs
        # whose true distance EQUALS the radius (translated duplicates:
        # 119/2000 dropped at eps==ETD, 4/2000 at one ulp, 0 at 1e-12
        # relative — pinned by test_radius_boundary_translated_duplicates).
        # Widening keeps the prune sound AND consistent with the distance
        # kernel: it shares this decider, so a NO at eps' > radius implies
        # its bisection distance >= eps' > radius — never a true top-k
        # member. Previously only the ETD pre-accept's bit-reproducibility
        # rescued these pairs; now the decision itself is safe.
        radius = rb.column("radius").to_numpy(zero_copy_only=False)
        radius = np.nextafter(radius * (1.0 + 1e-12), np.inf)
        keep = decide_pairs_arrow(
            rb.column("q_xs"),
            rb.column("q_ys"),
            rb.column("xs"),
            rb.column("ys"),
            radius,
        )
        idx = pa.array(np.nonzero(keep)[0])
        yield pa.RecordBatch.from_arrays(
            [rb.column("query_id").take(idx), rb.column("traj_id").take(idx)],
            ["query_id", "traj_id"],
        )


def decide_radius_prune(
    curves: DataFrame, queries: DataFrame, survivors: DataFrame
) -> DataFrame:
    """Step 2c: one batched DECISION per surviving pair at its query's
    radius (the k-th smallest ETD). At least k pairs per query have true
    distance <= radius, so a NO here proves the pair is outside the top k
    — one free-space sweep replaces the ~40-sweep bisection for every
    eliminated pair; only the accepted few get exact distances."""
    pairs = _pairs_with_arrays(curves, queries, survivors)
    n_slots = 2 * pairs.sparkSession.sparkContext.defaultParallelism
    return pairs.repartition(n_slots).mapInArrow(
        _decide_radius_kernel, schema="query_id long, traj_id long"
    )


def _pairs_with_arrays(
    curves: DataFrame, queries: DataFrame, pair_ids: DataFrame
) -> DataFrame:
    """Attach both curves' arrays to the pair list; extra ``pair_ids``
    columns (e.g. a per-pair radius) ride through."""
    extra = [c for c in pair_ids.columns if c not in ("query_id", "traj_id")]
    q = queries.select(
        F.col("traj_id").alias("query_id"),
        F.col("xs").alias("q_xs"),
        F.col("ys").alias("q_ys"),
    )
    t = curves.select("traj_id", "xs", "ys")
    return pair_ids.join(F.broadcast(q), "query_id").join(t, "traj_id").select(
        "query_id", "traj_id", "q_xs", "q_ys", "xs", "ys", *extra
    )


def knn_frechet(
    curves: DataFrame,
    queries: DataFrame,
    k: int,
    mesh: float | None = None,
    eps0: float | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """(query_id, traj_id, distance, rank): the k nearest trajectories per
    query by continuous Fréchet distance (self excluded). Ties break by
    traj_id ascending.

    Distances come from bisection at the reference's own tolerance
    (1e-6 relative, benchmark/test.py:96), so each value over-states the
    true distance by at most that much and two candidates whose true
    distances differ by less than ~2e-6 relative may swap ranks — the
    same guarantee the reference's kNN-by-bisection gives. Pass an
    exact-tolerance kernel via frechet_distances for stricter ranking.

    ``mesh``: home-cell size for the grid-prefiltered candidate stage
    (knn_candidates_grid — expanding Chebyshev ring probes; sublinear
    candidate streams on clustered corpora, identical top-k). ``None``
    falls back to the all-pairs scalar bound pass. ``eps0``/
    ``max_rounds`` are accepted for backward compatibility with the
    earlier eps-doubling implementation and ignored.

    Refine attach (r06): when both curve tables' array payloads fit the
    broadcast threshold, the ETD prune and the fused decide+distance
    stage gather arrays from broadcast curve packs (ids-only pair
    streams — the range_query broadcast-attach pattern) and the decide
    and distance kernels share one Arrow pass; past the threshold the
    original per-pair array-join path runs unchanged. Identical results
    either way (per-pair kernel outputs are batch-composition
    independent)."""
    from frechetrange_spark.operators.range_query import (
        _broadcast_threshold,
        _pack_broadcast,
        _payload_bytes_gated,
    )

    # curves feed three plan branches (scalar features, ETD arrays, final
    # arrays); eager localCheckpoint materializes the assembly lineage once
    # and its blocks are GC-cleaned with the DataFrame — nothing left for
    # the caller to unpersist in a long-lived session.
    curves = curves.localCheckpoint()
    queries = queries.localCheckpoint()
    if mesh is not None:
        candidates = knn_candidates_grid(curves, queries, k, float(mesh))
    else:
        candidates = knn_candidates(curves, queries, k)
    spark = curves.sparkSession
    thr = _broadcast_threshold(spark)
    packed = (
        thr > 0
        and _payload_bytes_gated(curves, thr) <= thr
        and _payload_bytes_gated(queries, thr) <= thr
    )
    n_slots = 2 * spark.sparkContext.defaultParallelism
    if packed:
        qb = _pack_broadcast(queries, 0)
        tb = _pack_broadcast(curves, 0)
        bounds = candidates.repartition(n_slots).mapInArrow(
            _etd_kernel_pack(qb, tb),
            schema="query_id long, traj_id long, lb double, etd double",
        )
        survivors = _etd_radius_prune(bounds, k)
        dists = survivors.repartition(n_slots).mapInArrow(
            _decide_distance_map(qb, tb),
            schema="query_id long, traj_id long, distance double",
        )
    else:
        survivors = etd_prune(curves, queries, candidates, k).localCheckpoint()
        finalists = decide_radius_prune(curves, queries, survivors)
        pairs = _pairs_with_arrays(curves, queries, finalists)
        dists = frechet_distances(pairs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("traj_id").asc()
    )
    return (
        dists.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "traj_id", "distance", F.col("rank").cast("long").alias("rank")
        )
    )
