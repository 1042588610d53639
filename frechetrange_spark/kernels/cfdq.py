"""K6: the bddm CFDQ sparse free-space decider with portal shortcuts, and
K9: portal recording during Agarwal simplification.

Faithful translation of detail/bddm/spatial_hash.hpp:

- ``decide_frechet_cfdq`` — ``cfdq_shortcuts::calculate`` (:862-1123):
  traverses only the reachable part of the free-space diagram using a
  double-buffered queue of reachable row-runs per column; with a portal
  map it can jump rows when the segment-Fréchet of the jump plus the
  recorded portal distance fits the base query delta (:1041-1084 — the
  base-eps guard that keeps jumps exact).
- ``agarwal_with_portals`` — ``progressive_agarwal`` (:1263-1350) applied
  to a full-resolution curve (parent == source, identity sourceIndex):
  every double-&-search probe records ``(prev, index, etd)`` as a portal;
  ``compile_portals`` then drops adjacent/duplicate portals and sorts each
  source's list by destination (O4, :618-622).

Decisions equal K5 (`core.decide_frechet`); property-tested, including
with portals active.
"""

from __future__ import annotations

import numpy as np

from frechetrange_spark.kernels.simplify import _prefix_arc, _segment_etd


def _interval(a, b1, b2, eps):
    """compute_interval (:371-421): free range of segment b1->b2 around
    point a; returns (free, start, end)."""
    b2m1x = b2[0] - b1[0]
    b2m1y = b2[1] - b1[1]
    b1max = b1[0] - a[0]
    b1may = b1[1] - a[1]
    A = b2m1x * b2m1x + b2m1y * b2m1y
    B = 2.0 * (b2m1x * b1max + b2m1y * b1may)
    C = b1max * b1max + b1may * b1may - eps * eps
    D = B * B - 4.0 * A * C
    if D < 0.0:
        return False, 0.0, 0.0
    sq = np.sqrt(D)
    if A == 0.0:
        # degenerate segment: the reference divides by 2A and yields
        # +/-inf; mirror its effective behavior (free iff C <= 0)
        if C <= 0.0:
            return True, 0.0, 1.0
        return False, 0.0, 0.0
    t1 = (-B + sq) / (2.0 * A)
    t2 = (-B - sq) / (2.0 * A)
    t1, t2 = min(t1, t2), max(t1, t2)
    if t2 < 0.0 or t1 > 1.0:
        return False, 0.0, 0.0
    return True, max(0.0, t1), min(1.0, t2)


def _flat_portals(portals) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Normalize a portal map to the flat-array interface: (srcs, dsts,
    dists) sorted by (src, dst). Accepts the flat triple itself (the fast
    path — e.g. sliced straight from the index table's Arrow buffers, no
    per-pair Python objects), a legacy {src: [(src, dst, dist)]} dict, or
    None."""
    if portals is None:
        z = np.empty(0, dtype=np.int64)
        return z, z, np.empty(0, dtype=np.float64)
    if isinstance(portals, tuple):
        srcs, dsts, dists = portals
        return (
            np.asarray(srcs, dtype=np.int64),
            np.asarray(dsts, dtype=np.int64),
            np.asarray(dists, dtype=np.float64),
        )
    flat = [t for src in sorted(portals) for t in portals[src]]
    srcs = np.asarray([t[0] for t in flat], dtype=np.int64)
    dsts = np.asarray([t[1] for t in flat], dtype=np.int64)
    dists = np.asarray([t[2] for t in flat], dtype=np.float64)
    return srcs, dsts, dists


def decide_frechet_cfdq(
    p: np.ndarray,
    q: np.ndarray,
    query_delta: float,
    base_query_delta: float | None = None,
    portals=None,
) -> bool:
    """True iff continuous Fréchet distance <= query_delta (cfdq
    ``calculate``, :885-1107). ``portals``: per-row jump shortcuts sorted
    by destination within each source row — pass the flat (srcs, dsts,
    dists) triple (see _flat_portals) to avoid any per-pair Python
    object churn; the row's group is found by np.searchsorted on the
    src-sorted array."""
    P = np.asarray(p, dtype=np.float64)
    Q = np.asarray(q, dtype=np.float64)
    if base_query_delta is None:
        base_query_delta = query_delta
    psrc, pdst, pdist = _flat_portals(portals)
    size_p, size_q = P.shape[0], Q.shape[0]
    d2s = float(np.sum((P[0] - Q[0]) ** 2))
    d2e = float(np.sum((P[-1] - Q[-1]) ** 2))
    if d2s > query_delta * query_delta or d2e > query_delta * query_delta:
        return False
    if size_p <= 1 or size_q <= 1:
        return False  # mirrors the reference's early return (:896-897)

    # queue entries: [start_row, end_row, lowest_right]
    qbuf = [[], []]
    first, second = 0, 1
    qbuf[first] = [[0, 0, 0.0]]
    qbuf[second] = []

    for column in range(size_q - 1):
        if not qbuf[first]:
            return False
        qbuf[second] = []
        row = qbuf[first][0][0]
        q_index = 0
        while q_index < len(qbuf[first]):
            left_most_top = 2.0
            while True:
                outside_queue = q_index >= len(qbuf[first])
                r_free, rf_s, rf_e = _interval(
                    Q[column + 1], P[row], P[row + 1], query_delta
                )
                rf_complete = r_free and rf_s == 0.0 and rf_e == 1.0
                if r_free:
                    if left_most_top <= 1.0:
                        new_lr = rf_s
                        if (
                            rf_complete
                            and qbuf[second]
                            and qbuf[second][-1][1] == row - 1
                        ):
                            qbuf[second][-1][1] = row
                        else:
                            qbuf[second].append([row, row, new_lr])
                    else:
                        if (
                            not outside_queue
                            and qbuf[first][q_index][0] <= row <= qbuf[first][q_index][1]
                        ):
                            if not (
                                row == qbuf[first][q_index][0]
                                and qbuf[first][q_index][2] > rf_e
                            ):
                                prev_r = (
                                    qbuf[first][q_index][2]
                                    if row == qbuf[first][q_index][0]
                                    else 0.0
                                )
                                new_lr = max(prev_r, rf_s)
                                if (
                                    rf_complete
                                    and new_lr == 0.0
                                    and qbuf[second]
                                    and qbuf[second][-1][1] == row - 1
                                ):
                                    qbuf[second][-1][1] = row
                                else:
                                    qbuf[second].append([row, row, new_lr])
                t_free, tf_s, tf_e = _interval(
                    P[row + 1], Q[column], Q[column + 1], query_delta
                )
                if (
                    not outside_queue
                    and qbuf[first][q_index][0] <= row <= qbuf[first][q_index][1]
                ):
                    if row == qbuf[first][q_index][1]:
                        q_index += 1
                    left_most_top = tf_s if t_free else 2.0
                elif t_free and left_most_top <= tf_e:
                    left_most_top = max(left_most_top, tf_s)
                else:
                    left_most_top = 2.0

                # portal jump (:1041-1084). The reference indexes
                # queue[first][qIndex] here with the ALREADY-incremented
                # qIndex guarded only by the stale outsideQueue flag; its
                # pre-sized vector then yields a zeroed entry (gap 0, no
                # jump) — the explicit bound check reproduces that.
                if (
                    not outside_queue
                    and q_index < len(qbuf[first])
                    and qbuf[second]
                    and qbuf[second][-1][1] == row
                    and r_free
                    and rf_e == 1.0
                ):
                    gap = qbuf[first][q_index][1] - qbuf[first][q_index][0]
                    if gap > 1 and psrc.size:
                        # the row's portal group: contiguous src-sorted
                        # slice, dst ascending inside it (O4 order)
                        lo = int(np.searchsorted(psrc, row, "left"))
                        hi = int(np.searchsorted(psrc, row, "right"))
                        choice_dst = -1
                        for j in range(lo, hi):
                            dst = int(pdst[j])
                            if dst <= qbuf[first][q_index][1]:
                                seg_frechet = np.sqrt(
                                    max(
                                        float(np.sum((P[row] - Q[column]) ** 2)),
                                        float(np.sum((P[dst] - Q[column]) ** 2)),
                                    )
                                )
                                if seg_frechet + float(pdist[j]) <= base_query_delta:
                                    choice_dst = dst
                            else:
                                break
                        if choice_dst >= 0:
                            row = choice_dst - 1  # -1 to counter the += 1 below
                            qbuf[second][-1][1] = row
                row += 1
                if not (left_most_top <= 1.0 and row < size_p - 1):
                    break
        first, second = second, first

    if not qbuf[first]:
        return False
    last = qbuf[first][-1]
    exit_ok = last[0] == size_p - 2 and last[2] <= 1.0
    return exit_ok or (last[1] == size_p - 2 and last[0] != size_p - 2)


def agarwal_with_portals(
    curve: np.ndarray,
    eps: float,
    etd_cache: dict | None = None,
) -> tuple[np.ndarray, list[tuple[int, int, float]]]:
    """K9 on a full-resolution curve: Agarwal simplification indices plus
    every probed (source, destination, etd) as a portal candidate.

    ``etd_cache``: optional (prev, k) -> ETD memo shared across the
    per-level runs over the same curve — the distances are
    eps-independent; every probe is still RECORDED as a portal."""
    c = np.asarray(curve, dtype=np.float64)
    n = c.shape[0]
    if n <= 2:
        return np.arange(n, dtype=np.int64), []
    tp = _prefix_arc(c)
    portals: list[tuple[int, int, float]] = []
    idx = [0]
    prev = 0
    while prev < n - 1:
        start, end = prev + 1, n

        def probe(k: int) -> bool:
            if etd_cache is None:
                dist = _segment_etd(c, tp, prev, k)
            else:
                dist = etd_cache.get((prev, k))
                if dist is None:
                    dist = _segment_etd(c, tp, prev, k)
                    etd_cache[(prev, k)] = dist
            portals.append((prev, k, dist))
            return dist <= eps

        k = start
        prevk = start
        iteration = 0
        while True:
            if k > end - 1:
                k = end - 1
            if not probe(k):
                upper, lower = k, prevk
                while upper - lower > 1:
                    mid = lower + (upper - lower) // 2
                    if probe(mid):
                        lower = mid
                    else:
                        upper = mid
                k = lower
                break
            if k == end - 1:
                break
            prevk = k
            k += 2**iteration
            iteration += 1
        idx.append(k)
        prev = k
    return np.asarray(idx, dtype=np.int64), portals


def compile_portals(
    portal_lists: list[list[tuple[int, int, float]]],
) -> dict[int, list[tuple[int, int, float]]]:
    """Merge portal candidates from several simplification levels into the
    per-source jump map: drop adjacent (dst-src == 1) and duplicate
    destinations, sort by destination (O4; spatial_hash.hpp:601-622)."""
    out: dict[int, list[tuple[int, int, float]]] = {}
    for plist in portal_lists:
        for src, dst, dist in plist:
            if dst - src == 1:
                continue
            bucket = out.setdefault(src, [])
            if any(b[1] == dst for b in bucket):
                continue
            bucket.append((src, dst, dist))
    for src in out:
        out[src].sort(key=lambda t: (t[1], t[2]))
    return out
