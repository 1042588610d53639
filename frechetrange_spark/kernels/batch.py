"""Pair-batched Fréchet kernels: decide and distance over B pairs at once.

The scalar decider (`core.decide_frechet`) mirrors the reference's dv
column sweep (detail/dv/frechet_distance.hpp:221-373) and costs ~n*m
Python-level loop steps per pair. Here the SAME sweep runs once per batch
with every step vectorized over the batch axis, so the Python-loop cost is
amortized over all pairs in an Arrow batch (~50-100x per-pair speedup on
55-point curves).

Padding trick: a polyline is unchanged by repeating its last vertex, so
curves are padded to the batch max length with copies of their final
point — no masking, no semantic drift; degenerate (zero-length) segments
take the reference's a==0 branch of the line–circle interval solve
(detail/dv/frechet_distance.hpp:409-415). Agreement with the scalar
kernel (and hence the reference semantics) is property-tested in
tests/test_kernels.py.

Decisions use per-pair eps, which also gives a batched bisection for the
distance value (K12, samples/plain.cpp:47-60): all pairs bisect in
lockstep on their own brackets.
"""

from __future__ import annotations

import numpy as np

_INF = np.inf


def size_buckets(
    ps: list[np.ndarray], qs: list[np.ndarray], chunk: int = 2048
) -> list[np.ndarray]:
    """Index groups sorted by (len(p)+len(q)) and chunked, so each padded
    sub-batch wastes little on length variance."""
    order = np.argsort(
        np.fromiter((p.shape[0] + q.shape[0] for p, q in zip(ps, qs)), dtype=np.int64)
    )
    return [order[i : i + chunk] for i in range(0, len(order), chunk)]


def pad_curves(curves: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Stack (n_i, 2) curves into (B, N, 2), padding with the last vertex.
    Returns (padded, lengths)."""
    lens = np.fromiter((c.shape[0] for c in curves), dtype=np.int64, count=len(curves))
    n_max = int(lens.max())
    out = np.empty((len(curves), n_max, 2), dtype=np.float64)
    for i, c in enumerate(curves):
        k = c.shape[0]
        out[i, :k] = c
        if k < n_max:
            out[i, k:] = c[k - 1]
    return out, lens


def _solve_quadratic_interval_2d(
    a: np.ndarray, b: np.ndarray, c: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Elementwise a*t^2 + b*t + c <= 0 clipped to [0,1] over (B, K) arrays;
    empty -> (+inf, -inf). Same semantics as core._solve_quadratic_interval,
    branch-free (no boolean fancy indexing — every path is a flat where)."""
    # nd/den on the ORIGINAL (possibly (B,1)) shape: the segment-vs-points
    # caller passes a constant `a` per row, so the comparison and the
    # division run on B elements instead of B*M — numpy broadcasting in
    # the arithmetic below yields bit-identical element values.
    nd = a > 0.0
    den = 0.5 / np.where(nd, a, 1.0)
    nd = np.broadcast_to(nd, c.shape)
    disc = b * b - 4.0 * a * c
    sq = np.sqrt(np.maximum(disc, 0.0))
    t1 = (-b - sq) * den
    t2 = (-b + sq) * den
    okr = nd & (disc >= 0.0) & (t1 <= 1.0) & (t2 >= 0.0)
    degen_free = ~nd & (c <= 0.0)
    lo = np.where(okr, np.minimum(np.maximum(t1, 0.0), 1.0), np.where(degen_free, 0.0, _INF))
    hi = np.where(okr, np.minimum(np.maximum(t2, 0.0), 1.0), np.where(degen_free, 1.0, -_INF))
    return lo, hi


def _free_point_vs_segments(
    point: np.ndarray, q: np.ndarray, eps2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """point (B,2) vs segments q[:, j]->q[:, j+1]: (B, M-1) intervals."""
    s0 = q[:, :-1, :]
    d = q[:, 1:, :] - s0
    f = s0 - point[:, None, :]
    a = d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1]
    b = 2.0 * (f[..., 0] * d[..., 0] + f[..., 1] * d[..., 1])
    c = f[..., 0] * f[..., 0] + f[..., 1] * f[..., 1] - eps2[:, None]
    return _solve_quadratic_interval_2d(a, b, c)


def _free_segment_vs_points(
    s0: np.ndarray, s1: np.ndarray, q: np.ndarray, eps2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """segment s0->s1 ((B,2) each) vs all points of q (B,M,2): (B,M)."""
    d = s1 - s0  # (B,2)
    f = s0[:, None, :] - q  # (B,M,2)
    a = (d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1])[:, None]
    b = 2.0 * (f[..., 0] * d[:, None, 0] + f[..., 1] * d[:, None, 1])
    c = f[..., 0] * f[..., 0] + f[..., 1] * f[..., 1] - eps2[:, None]
    return _solve_quadratic_interval_2d(a, b, c)


def _br_chain_batch(
    a: np.ndarray, b: np.ndarray, reset: np.ndarray, blo: np.ndarray
) -> np.ndarray:
    """Vectorized bottom-reachability chain of one free-space column.

    Sequential semantics (the scalar loop in core.decide_frechet):

        s[0] = blo
        s[t] = a[t]                             if reset[t]
             = max(a[t], s[t-1]) if <= b[t]     else INF   (INF propagates)

    where a/b are the horizontal free-interval bounds (each a[t] is in
    [0,1] or INF) and reset[t] marks cells enterable from the left
    boundary. Evaluated as a SEGMENTED running max with cap violations:
    resets open segments; within a segment s[t] is the running max of a
    unless any position since the reset overflowed its cap (then INF).
    Prefix-doubling gives O(log M) numpy passes instead of an M-step
    Python loop — the former O(N*M) interpreter cost of the whole sweep
    drops to O(N*log M)."""
    B, M = a.shape
    tidx = np.arange(M)
    rv = reset.copy()
    rv[:, 0] = True  # t=0 is the injected bottom entry
    av = a.copy()
    av[:, 0] = blo
    bv = np.where(rv, _INF, b)  # reset values are not capped
    # last reset position <= t
    seg = np.maximum.accumulate(np.where(rv, tidx[None, :], 0), axis=1)
    # segmented running max of av via Hillis-Steele doubling
    rm = av
    shift = 1
    while shift < M:
        shifted = np.empty_like(rm)
        shifted[:, :shift] = -_INF
        shifted[:, shift:] = rm[:, :-shift]
        valid = seg <= (tidx - shift)[None, :]
        rm = np.maximum(rm, np.where(valid, shifted, -_INF))
        shift *= 2
    # violation anywhere in the current segment poisons the chain
    viol = rm > bv
    last_viol = np.maximum.accumulate(
        np.where(viol, tidx[None, :], -1), axis=1
    )
    return np.where(last_viol >= seg, _INF, rm)


def decide_frechet_batch(
    p: np.ndarray, q: np.ndarray, eps: np.ndarray
) -> np.ndarray:
    """Vectorized decision for B pairs: p (B,N,2), q (B,M,2) last-vertex
    padded, eps (B,). Returns bool (B,). Exact same accept/reject semantics
    as core.decide_frechet (strict > endpoint reject, <=-free intervals)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    eps = np.asarray(eps, dtype=np.float64)
    B, N = p.shape[0], p.shape[1]
    M = q.shape[1]
    eps2 = eps * eps

    def d2(u: np.ndarray, v: np.ndarray) -> np.ndarray:
        d = u - v
        return d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]

    # F1 endpoint check (padding preserves endpoints).
    alive = (d2(p[:, 0], q[:, 0]) <= eps2) & (d2(p[:, -1], q[:, -1]) <= eps2)
    if N == 1 and M == 1:
        return alive
    if N == 1:
        dd = q - p[:, 0][:, None, :]
        mx = np.max(dd[..., 0] ** 2 + dd[..., 1] ** 2, axis=1)
        return alive & (mx <= eps2)
    if M == 1:
        dd = p - q[:, 0][:, None, :]
        mx = np.max(dd[..., 0] ** 2 + dd[..., 1] ** 2, axis=1)
        return alive & (mx <= eps2)

    # Compact away endpoint-rejected pairs (cheap, and in bisection the
    # low-eps probes reject most of the batch right here).
    out = np.zeros(B, dtype=bool)
    orig_idx = np.nonzero(alive)[0]
    if orig_idx.size == 0:
        return out
    if orig_idx.size < B:
        p, q, eps2 = p[orig_idx], q[orig_idx], eps2[orig_idx]
        B = orig_idx.size
    alive = np.ones(B, dtype=bool)

    # Column-0 left boundary: chain up the left edge from the origin.
    fl_lo, fl_hi = _free_point_vs_segments(p[:, 0], q, eps2)  # (B, M-1)
    full = (fl_lo <= 0.0) & (fl_hi >= 1.0)
    prefix_ok = np.ones((B, M - 1), dtype=bool)
    if M > 2:
        prefix_ok[:, 1:] = np.cumprod(full[:, :-1], axis=1).astype(bool)
    reach = prefix_ok & (fl_lo <= 0.0)
    lr_lo = np.where(reach, 0.0, _INF)
    lr_hi = np.where(reach, fl_hi, -_INF)

    bottom_prefix_ok = np.ones(B, dtype=bool)
    br_lo = np.full((B, M), _INF)
    fh_hi_top = np.full(B, -_INF)

    for i in range(N - 1):
        fh_lo, fh_hi = _free_segment_vs_points(p[:, i], p[:, i + 1], q, eps2)

        blo = np.where(bottom_prefix_ok & (fh_lo[:, 0] <= 0.0), 0.0, _INF)
        bottom_prefix_ok &= (fh_lo[:, 0] <= 0.0) & (fh_hi[:, 0] >= 1.0)

        left_ok = lr_lo <= lr_hi  # (B, M-1)
        reset = np.zeros((B, M), dtype=bool)
        reset[:, 1:] = left_ok
        br_lo = _br_chain_batch(fh_lo, fh_hi, reset, blo)

        fh_hi_top = fh_hi[:, M - 1]

        if i == N - 2:
            break

        fv_lo, fv_hi = _free_point_vs_segments(p[:, i + 1], q, eps2)
        bottom_ok = br_lo[:, :-1] <= 1.0
        entry_lo = np.where(bottom_ok, 0.0, np.where(left_ok, lr_lo, _INF))
        new_lo = np.maximum(fv_lo, entry_lo)
        dead = new_lo > fv_hi
        lr_lo = np.where(dead, _INF, new_lo)
        lr_hi = np.where(dead, -_INF, fv_hi)

        # Early exit (dv:334-337): a pair whose next column has no live
        # left boundary and whose bottom chain is blocked can never recover.
        alive &= bottom_prefix_ok | ~dead.all(axis=1)
        n_alive = int(alive.sum())
        if n_alive == 0:
            break
        # Compact the batch when enough pairs are definitively rejected —
        # the remaining sweep then runs on the survivors only.
        if n_alive <= B // 2 and B > 64:
            keep = np.nonzero(alive)[0]
            orig_idx = orig_idx[keep]
            p, q, eps2 = p[keep], q[keep], eps2[keep]
            lr_lo, lr_hi = lr_lo[keep], lr_hi[keep]
            br_lo = br_lo[keep]
            bottom_prefix_ok = bottom_prefix_ok[keep]
            fh_hi_top = fh_hi_top[keep]
            alive = np.ones(keep.size, dtype=bool)
            B = keep.size

    # Accept via the top boundary of the last cell...
    accept = (br_lo[:, M - 1] <= 1.0) & (fh_hi_top >= 1.0)
    # ...or via the right boundary of the top-right cell.
    fv_lo, fv_hi = _free_point_vs_segments(p[:, N - 1], q, eps2)
    j = M - 2
    left_ok_last = lr_lo[:, j] <= lr_hi[:, j]
    bottom_ok_last = br_lo[:, j] <= 1.0
    entry = np.where(bottom_ok_last, 0.0, np.where(left_ok_last, lr_lo[:, j], _INF))
    rlo = np.maximum(fv_lo[:, j], entry)
    accept |= (rlo <= fv_hi[:, j]) & (fv_hi[:, j] >= 1.0) & (rlo <= 1.0)
    out[orig_idx] = alive & accept
    return out


def etd_batch(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Batched equal-time distance (F8 upper bound, bddm:253-362) over
    last-vertex-padded stacks p (B,N,2), q (B,M,2). Returns (B,) floats.

    Both curves are traversed at equal relative arc-length speed; the
    pairwise distance is convex between knot events, so the max over the
    union of both knot sets is exact. Padding adds zero-length segments,
    i.e. duplicate knots — harmless under max."""
    B, N = p.shape[0], p.shape[1]
    M = q.shape[1]
    tp = np.zeros((B, N))
    np.cumsum(
        np.sqrt(np.sum(np.diff(p, axis=1) ** 2, axis=2)), axis=1, out=tp[:, 1:]
    )
    tq = np.zeros((B, M))
    np.cumsum(
        np.sqrt(np.sum(np.diff(q, axis=1) ** 2, axis=2)), axis=1, out=tq[:, 1:]
    )
    lp = tp[:, -1:]
    lq = tq[:, -1:]
    rp = np.divide(tp, lp, out=np.zeros_like(tp), where=lp > 0.0)
    rq = np.divide(tq, lq, out=np.zeros_like(tq), where=lq > 0.0)
    rp[:, -1] = np.where(lp[:, 0] > 0.0, 1.0, 0.0)
    rq[:, -1] = np.where(lq[:, 0] > 0.0, 1.0, 0.0)

    # Merge both knot sets: stable argsort over the concatenation puts
    # rp-knots before equal rq-knots, so running counts give, per merged
    # event time, the index of the last knot <= t on each curve — a
    # vectorized merge, no per-pair searchsorted.
    both = np.concatenate([rp, rq], axis=1)  # (B, N+M)
    order = np.argsort(both, axis=1, kind="stable")
    times = np.take_along_axis(both, order, axis=1)
    from_p = order < N
    jp = np.clip(np.cumsum(from_p, axis=1) - 1, 0, max(N - 2, 0))
    jq = np.clip(np.cumsum(~from_p, axis=1) - 1, 0, max(M - 2, 0))

    def sample(knots: np.ndarray, xy: np.ndarray, j: np.ndarray) -> np.ndarray:
        j1 = np.minimum(j + 1, knots.shape[1] - 1)
        k0 = np.take_along_axis(knots, j, axis=1)
        k1 = np.take_along_axis(knots, j1, axis=1)
        den = k1 - k0
        # Full-speed SIMD divide + select: a `where=`-masked divide falls
        # back to buffered iteration, and with padded curves ~half the
        # knot gaps are exact ties (den == 0), making the masked path the
        # kernel's warm-time hot spot. Dividing unconditionally (0/0 and
        # x/0 suppressed) then selecting is ~4x faster at 50% ties.
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = (times - k0) / den
        frac = np.where(den > 0.0, frac, 0.0)
        np.clip(frac, 0.0, 1.0, out=frac)
        out = np.empty((knots.shape[0], times.shape[1], 2))
        for d in range(2):
            # gather from a contiguous copy: xy[:, :, d] is a stride-2
            # view and take_along_axis on it is markedly slower
            coord = np.ascontiguousarray(xy[:, :, d])
            v0 = np.take_along_axis(coord, j, axis=1)
            v1 = np.take_along_axis(coord, j1, axis=1)
            out[:, :, d] = v0 + frac * (v1 - v0)
        return out

    pe = sample(rp, p, jp)
    qe = sample(rq, q, jq)
    d2 = np.sum((pe - qe) ** 2, axis=2)
    return np.sqrt(d2.max(axis=1))


def greedy_ub_batch(
    p: np.ndarray, q: np.ndarray, lens_p: np.ndarray, lens_q: np.ndarray
) -> np.ndarray:
    """F4 batched: greedy monotone alignment upper bound
    (detail/bb/spatial_index.hpp:251-278) in lockstep over B padded pairs —
    every pair advances its own (i, j) pointers, each step one vectorized
    gather. Bit-identical to core.greedy_upper_bound per pair (tested):
    diagonal wins ties, then the i-step (the scalar's min()/== order)."""
    B = p.shape[0]
    rows = np.arange(B)
    n = np.asarray(lens_p, dtype=np.int64)
    m = np.asarray(lens_q, dtype=np.int64)
    i = np.zeros(B, dtype=np.int64)
    j = np.zeros(B, dtype=np.int64)

    def d2_at(ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
        d = p[rows, ii] - q[rows, jj]
        return d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]

    best = d2_at(i, j)
    active = (i < n - 1) | (j < m - 1)
    while active.any():
        can_i = i < n - 1
        can_j = j < m - 1
        i1 = np.minimum(i + 1, n - 1)
        j1 = np.minimum(j + 1, m - 1)
        a = np.where(can_i, d2_at(i1, j), _INF)
        b = np.where(can_j, d2_at(i, j1), _INF)
        c = np.where(can_i & can_j, d2_at(i1, j1), _INF)
        step = np.minimum(np.minimum(a, b), c)
        diag = active & (step == c)
        ai = active & ~diag & (step == a)
        bj = active & ~diag & ~ai
        i = np.where(diag | ai, i1, i)
        j = np.where(diag | bj, j1, j)
        best = np.where(active & (step > best), step, best)
        active = (i < n - 1) | (j < m - 1)
    return np.sqrt(best)


def _list_buffers(arr) -> tuple[np.ndarray, np.ndarray]:
    """(flat_values, absolute_offsets) of a pyarrow ListArray — zero-copy."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.values.to_numpy(), arr.offsets.to_numpy().astype(np.int64)


def _padded_gather(
    flat: np.ndarray, off: np.ndarray, rows: np.ndarray, width: int
) -> np.ndarray:
    """(len(rows), width) matrix: row r = flat[off[r]:off[r+1]] padded by
    repeating its last element (clip on the gather index — vectorized,
    no per-row allocation)."""
    lens = off[rows + 1] - off[rows]
    if rows.size and int(lens.min()) < 1:
        # a zero-length list row would gather flat[off[r]-1] — the previous
        # curve's data — and silently corrupt the decision; fail loudly.
        raise ValueError("padded gather requires every list row non-empty")
    idx = off[rows, None] + np.minimum(np.arange(width)[None, :], (lens - 1)[:, None])
    return flat[idx]


def dfd_leq_batch(p: np.ndarray, q: np.ndarray, eps2: np.ndarray) -> np.ndarray:
    """Discrete-Fréchet accept filter: True where the DISCRETE Fréchet
    distance (min over monotone vertex couplings of the max pair
    distance) is <= sqrt(eps2). Sound as a YES-prover for the continuous
    decision — a vertex coupling is a continuous matching, so
    d_F <= d_dF always (Eiter & Mannila 1994) — and last-vertex padding
    only duplicates vertices, which min-max DP ignores.

    Vectorized over the batch: the classic DP row recurrence
    ``dp[j] = max(D[j], min(dp_prev[j], dp_prev[j-1], dp[j-1]))`` has a
    sequential dp[j-1] dependency, but x -> max(c, min(a, x)) is a clamp
    and clamps compose into clamps ((c1,a1) then (c2,a2) ->
    (max(c2, min(a2, c1)), min(a1, a2))), so each row is a Hillis-Steele
    prefix composition: O(log M) min/max passes, no quadratic solves, no
    sqrt/division — ~2-3x cheaper per cell than the free-space sweep.
    All ops are exact (min/max/compare), so the result is deterministic
    and batch-composition independent.

    Early exit: the DP row minimum is monotone non-decreasing in i, so a
    pair whose row min exceeds eps2 can never accept — such pairs are
    compacted out mid-sweep (they are handed to the exact decider by the
    caller anyway)."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    B, N = p.shape[0], p.shape[1]
    M = q.shape[1]
    out = np.zeros(B, dtype=bool)
    if B == 0:
        return out
    eps2 = np.broadcast_to(np.asarray(eps2, dtype=np.float64), (B,)).copy()
    orig = np.arange(B)

    def drow(pp, qq, i):
        dd = pp[:, i, None, :] - qq
        return dd[..., 0] * dd[..., 0] + dd[..., 1] * dd[..., 1]

    dp = np.maximum.accumulate(drow(p, q, 0), axis=1)
    for i in range(1, N):
        alive = dp.min(axis=1) <= eps2
        n_alive = int(alive.sum())
        if n_alive == 0:
            return out
        if n_alive <= dp.shape[0] // 2 and dp.shape[0] > 64:
            keep = np.nonzero(alive)[0]
            orig, p, q, dp, eps2 = orig[keep], p[keep], q[keep], dp[keep], eps2[keep]
        D = drow(p, q, i)
        a = dp.copy()
        a[:, 1:] = np.minimum(dp[:, 1:], dp[:, :-1])
        C, A = D, a
        shift = 1
        while shift < M:
            C2 = np.empty_like(C)
            A2 = np.empty_like(A)
            C2[:, :shift] = C[:, :shift]
            A2[:, :shift] = A[:, :shift]
            np.maximum(
                C[:, shift:],
                np.minimum(A[:, shift:], C[:, :-shift]),
                out=C2[:, shift:],
            )
            np.minimum(A[:, :-shift], A[:, shift:], out=A2[:, shift:])
            C, A = C2, A2
            shift *= 2
        x0 = np.maximum(D[:, 0], dp[:, 0])
        dp = np.maximum(C, np.minimum(A, x0[:, None]))
        dp[:, 0] = x0
    out[orig] = dp[:, -1] <= eps2
    return out


# funnel stage codes reported by decide_pairs_arrow(return_stages=True)
STAGE_ETD_ACCEPT = 1  # F8 equal-time upper bound <= eps
STAGE_GREEDY_ACCEPT = 2  # F4 greedy upper bound <= eps
STAGE_NEG_REJECT = 3  # F5 negative filter proved > eps
STAGE_DECIDER_YES = 4  # K5 free-space DP
STAGE_DECIDER_NO = 5
STAGE_GREEDY_REV_ACCEPT = 6  # F4 greedy on the reversed pair
STAGE_DFD_ACCEPT = 7  # discrete-Fréchet upper bound <= eps

STAGE_NAMES = {
    STAGE_ETD_ACCEPT: "etd_accept",
    STAGE_GREEDY_ACCEPT: "greedy_accept",
    STAGE_NEG_REJECT: "neg_reject",
    STAGE_DECIDER_YES: "decider_yes",
    STAGE_DECIDER_NO: "decider_no",
    STAGE_GREEDY_REV_ACCEPT: "greedy_rev_accept",
    STAGE_DFD_ACCEPT: "dfd_accept",
}


def decide_pairs_arrow(
    qxs,
    qys,
    xs,
    ys,
    eps,
    chunk: int = 4096,
    etd_accept: bool = True,
    greedy_accept: bool = False,
    neg_reject: bool = False,
    rev_greedy_accept: bool = False,
    dfd_accept: bool = False,
    return_stages: bool = False,
) -> np.ndarray:
    """Batched decision straight from pyarrow list columns (B rows), with
    size-bucketed padding. Returns bool (B,), or (bool, stage int8) with
    ``return_stages``.

    Filter pack in the reference bb order (F4 accept -> F5 reject ->
    decider, detail/bb/spatial_index.hpp:198-209), plus the bddm ETD
    accept (F8) first — every filter is result-set invariant (tested);
    flags only change cost:

    - ``etd_accept``: batched equal-time-distance upper bound — pairs with
      ETD <= eps accepted without the O(N*M) sweep.
    - ``greedy_accept``: F4 batched greedy upper bound on the remainder.
    - ``neg_reject``: F5 galloping negative filter, scalar per pair on the
      post-accept remainder only (the funnel tail — its cost tracks the
      undecided count, not the candidate count).
    - ``rev_greedy_accept``: F4 greedy again on the REVERSED pair
      (d_F is invariant under joint reversal, so the reversed greedy walk
      is an independent sound upper bound — measured it accepts ~20% of
      the pairs the forward walk misses, at the same tiny cost).
    - ``dfd_accept``: discrete-Fréchet upper-bound accept
      (``dfd_leq_batch``) on the remainder — min/max DP, ~2-3x cheaper
      than the free-space sweep, catches nearly all remaining true
      matches so the exact decider mostly sees rejects (which its
      early-exit compaction handles cheaply)."""
    fqx, oqx = _list_buffers(qxs)
    fqy, oqy = _list_buffers(qys)
    ftx, otx = _list_buffers(xs)
    fty, oty = _list_buffers(ys)
    B = len(oqx) - 1
    sel = np.arange(B, dtype=np.int64)
    return decide_pairs_buffers(
        (fqx, oqx, fqy, oqy),
        (ftx, otx, fty, oty),
        sel,
        sel,
        eps,
        chunk=chunk,
        etd_accept=etd_accept,
        greedy_accept=greedy_accept,
        neg_reject=neg_reject,
        rev_greedy_accept=rev_greedy_accept,
        dfd_accept=dfd_accept,
        return_stages=return_stages,
    )


def decide_pairs_buffers(
    bq: tuple,
    bt: tuple,
    qsel: np.ndarray,
    tsel: np.ndarray,
    eps,
    chunk: int = 4096,
    etd_accept: bool = True,
    greedy_accept: bool = False,
    neg_reject: bool = False,
    rev_greedy_accept: bool = False,
    dfd_accept: bool = False,
    return_stages: bool = False,
) -> np.ndarray:
    """decide_pairs_arrow's core over raw list buffers with per-pair curve
    indirection: ``bq``/``bt`` are (flat_x, off_x, flat_y, off_y) curve
    TABLES (one list row per curve), and pair i compares curve
    ``qsel[i]`` of bq against curve ``tsel[i]`` of bt. The arrow wrapper
    passes identity selectors over per-pair columns; the broadcast-attach
    refine passes id-resolved selectors into a shared curve table, so the
    pair rows themselves carry no array bytes."""
    from frechetrange_spark.kernels.core import negfilter

    fqx, oqx, fqy, oqy = bq
    ftx, otx, fty, oty = bt
    B = int(qsel.size)
    out = np.zeros(B, dtype=bool)
    stages = np.zeros(B, dtype=np.int8)
    if B == 0:
        return (out, stages) if return_stages else out
    eps_arr = np.broadcast_to(np.asarray(eps, dtype=np.float64), (B,))
    lens_p = oqx[qsel + 1] - oqx[qsel]
    lens_t = otx[tsel + 1] - otx[tsel]
    order = np.argsort(lens_p + lens_t)
    for s in range(0, B, chunk):
        rows = order[s : s + chunk]
        wp = int(lens_p[rows].max())
        wt = int(lens_t[rows].max())
        p = np.stack(
            [
                _padded_gather(fqx, oqx, qsel[rows], wp),
                _padded_gather(fqy, oqy, qsel[rows], wp),
            ],
            axis=-1,
        )
        t = np.stack(
            [
                _padded_gather(ftx, otx, tsel[rows], wt),
                _padded_gather(fty, oty, tsel[rows], wt),
            ],
            axis=-1,
        )
        e = eps_arr[rows]
        res = np.zeros(rows.size, dtype=bool)
        stg = np.zeros(rows.size, dtype=np.int8)
        todo = np.arange(rows.size)
        if etd_accept:
            acc = etd_batch(p, t) <= e
            res |= acc
            stg[acc] = STAGE_ETD_ACCEPT
            todo = np.nonzero(~res)[0]
        if greedy_accept and todo.size:
            ub = greedy_ub_batch(
                p[todo], t[todo], lens_p[rows][todo], lens_t[rows][todo]
            )
            acc = ub <= e[todo]
            res[todo[acc]] = True
            stg[todo[acc]] = STAGE_GREEDY_ACCEPT
            todo = todo[~acc]
        if rev_greedy_accept and todo.size:
            # reversed padded curves: leading duplicate vertices are
            # harmless for the greedy bound (zero-length steps), so the
            # full padded width serves as the length
            pr = p[todo, ::-1].copy()
            tr = t[todo, ::-1].copy()
            ub = greedy_ub_batch(
                pr,
                tr,
                np.full(todo.size, p.shape[1], dtype=np.int64),
                np.full(todo.size, t.shape[1], dtype=np.int64),
            )
            acc = ub <= e[todo]
            res[todo[acc]] = True
            stg[todo[acc]] = STAGE_GREEDY_REV_ACCEPT
            todo = todo[~acc]
        if dfd_accept and todo.size:
            acc = dfd_leq_batch(p[todo], t[todo], e[todo] * e[todo])
            res[todo[acc]] = True
            stg[todo[acc]] = STAGE_DFD_ACCEPT
            todo = todo[~acc]
        if neg_reject and todo.size:
            lp = lens_p[rows]
            lt = lens_t[rows]
            drop = np.zeros(todo.size, dtype=bool)
            for ii, k in enumerate(todo):
                drop[ii] = negfilter(p[k, : lp[k]], t[k, : lt[k]], float(e[k]))
            stg[todo[drop]] = STAGE_NEG_REJECT
            todo = todo[~drop]
        if todo.size:
            dec = decide_frechet_batch(p[todo], t[todo], e[todo])
            res[todo] = dec
            stg[todo] = np.where(dec, STAGE_DECIDER_YES, STAGE_DECIDER_NO)
        out[rows] = res
        stages[rows] = stg
    return (out, stages) if return_stages else out


def _gather_pair(fqx, oqx, fqy, oqy, ftx, otx, fty, oty, rows):
    """Padded (B,N,2)/(B,M,2) stacks for the selected pair rows."""
    wp = int((oqx[rows + 1] - oqx[rows]).max())
    wt = int((otx[rows + 1] - otx[rows]).max())
    p = np.stack(
        [_padded_gather(fqx, oqx, rows, wp), _padded_gather(fqy, oqy, rows, wp)],
        axis=-1,
    )
    t = np.stack(
        [_padded_gather(ftx, otx, rows, wt), _padded_gather(fty, oty, rows, wt)],
        axis=-1,
    )
    return p, t


def etd_pairs_arrow(qxs, qys, xs, ys, chunk: int = 4096) -> np.ndarray:
    """Batched equal-time distance (F8) straight from pyarrow list columns,
    size-bucketed padded gathers — zero per-row Python objects."""
    fqx, oqx = _list_buffers(qxs)
    fqy, oqy = _list_buffers(qys)
    ftx, otx = _list_buffers(xs)
    fty, oty = _list_buffers(ys)
    B = len(oqx) - 1
    out = np.empty(B, dtype=np.float64)
    if B == 0:
        return out
    order = np.argsort(np.diff(oqx) + np.diff(otx))
    for s in range(0, B, chunk):
        rows = order[s : s + chunk]
        p, t = _gather_pair(fqx, oqx, fqy, oqy, ftx, otx, fty, oty, rows)
        out[rows] = etd_batch(p, t)
    return out


def distance_pairs_arrow(
    qxs,
    qys,
    xs,
    ys,
    chunk: int = 2048,
    rel_tol: float = 1e-9,
    abs_tol: float = 1e-12,
) -> np.ndarray:
    """Batched bisection distance straight from pyarrow list columns —
    size-bucketed padded gathers feeding the lockstep bisection, same
    zero-copy path as decide_pairs_arrow."""
    fqx, oqx = _list_buffers(qxs)
    fqy, oqy = _list_buffers(qys)
    ftx, otx = _list_buffers(xs)
    fty, oty = _list_buffers(ys)
    B = len(oqx) - 1
    out = np.empty(B, dtype=np.float64)
    if B == 0:
        return out
    order = np.argsort(np.diff(oqx) + np.diff(otx))
    for s in range(0, B, chunk):
        rows = order[s : s + chunk]
        p, t = _gather_pair(fqx, oqx, fqy, oqy, ftx, otx, fty, oty, rows)
        out[rows] = _frechet_distance_padded(p, t, rel_tol, abs_tol)
    return out


def etd_pairs_buffers(
    bq: tuple, bt: tuple, qsel: np.ndarray, tsel: np.ndarray, chunk: int = 4096
) -> np.ndarray:
    """``etd_pairs_arrow`` over raw list buffers with per-pair curve
    indirection (the broadcast-pack attach shape, cf.
    decide_pairs_buffers): pair i compares curve ``qsel[i]`` of bq
    against curve ``tsel[i]`` of bt."""
    fqx, oqx, fqy, oqy = bq
    ftx, otx, fty, oty = bt
    B = int(qsel.size)
    out = np.empty(B, dtype=np.float64)
    if B == 0:
        return out
    lens = (oqx[qsel + 1] - oqx[qsel]) + (otx[tsel + 1] - otx[tsel])
    order = np.argsort(lens)
    for s in range(0, B, chunk):
        rows = order[s : s + chunk]
        qr, tr = qsel[rows], tsel[rows]
        wp = int((oqx[qr + 1] - oqx[qr]).max())
        wt = int((otx[tr + 1] - otx[tr]).max())
        p = np.stack(
            [_padded_gather(fqx, oqx, qr, wp), _padded_gather(fqy, oqy, qr, wp)],
            axis=-1,
        )
        t = np.stack(
            [_padded_gather(ftx, otx, tr, wt), _padded_gather(fty, oty, tr, wt)],
            axis=-1,
        )
        out[rows] = etd_batch(p, t)
    return out


def distance_pairs_buffers(
    bq: tuple,
    bt: tuple,
    qsel: np.ndarray,
    tsel: np.ndarray,
    chunk: int = 2048,
    rel_tol: float = 1e-9,
    abs_tol: float = 1e-12,
) -> np.ndarray:
    """``distance_pairs_arrow`` over raw list buffers with per-pair curve
    indirection (broadcast-pack attach shape). Per-pair values are
    independent of batch composition (every bisection step is elementwise
    per pair), so results equal the arrow-column path exactly."""
    fqx, oqx, fqy, oqy = bq
    ftx, otx, fty, oty = bt
    B = int(qsel.size)
    out = np.empty(B, dtype=np.float64)
    if B == 0:
        return out
    lens = (oqx[qsel + 1] - oqx[qsel]) + (otx[tsel + 1] - otx[tsel])
    order = np.argsort(lens)
    for s in range(0, B, chunk):
        rows = order[s : s + chunk]
        qr, tr = qsel[rows], tsel[rows]
        wp = int((oqx[qr + 1] - oqx[qr]).max())
        wt = int((otx[tr + 1] - otx[tr]).max())
        p = np.stack(
            [_padded_gather(fqx, oqx, qr, wp), _padded_gather(fqy, oqy, qr, wp)],
            axis=-1,
        )
        t = np.stack(
            [_padded_gather(ftx, otx, tr, wt), _padded_gather(fty, oty, tr, wt)],
            axis=-1,
        )
        out[rows] = _frechet_distance_padded(p, t, rel_tol, abs_tol)
    return out


def decide_frechet_pairs(
    ps: list[np.ndarray], qs: list[np.ndarray], eps: np.ndarray | float
) -> np.ndarray:
    """Convenience driver over ragged pair lists: size-bucket, pad, decide.
    Returns bool (B,)."""
    B = len(ps)
    out = np.zeros(B, dtype=bool)
    if B == 0:
        return out
    eps_arr = np.broadcast_to(np.asarray(eps, dtype=np.float64), (B,))
    for idx in size_buckets(ps, qs):
        p, _ = pad_curves([ps[i] for i in idx])
        q, _ = pad_curves([qs[i] for i in idx])
        out[idx] = decide_frechet_batch(p, q, eps_arr[idx])
    return out


def frechet_distance_pairs(
    ps: list[np.ndarray],
    qs: list[np.ndarray],
    rel_tol: float = 1e-9,
    abs_tol: float = 1e-12,
) -> np.ndarray:
    """Size-bucketed batched distance values over ragged pair lists."""
    B = len(ps)
    out = np.empty(B, dtype=np.float64)
    if B == 0:
        return out
    for idx in size_buckets(ps, qs):
        out[idx] = frechet_distance_batch(
            [ps[i] for i in idx], [qs[i] for i in idx], rel_tol, abs_tol
        )
    return out


def frechet_distance_batch(
    ps: list[np.ndarray],
    qs: list[np.ndarray],
    rel_tol: float = 1e-9,
    abs_tol: float = 1e-12,
) -> np.ndarray:
    """Fréchet distance values for B ragged pairs: pad, then lockstep
    bisection (see _frechet_distance_padded)."""
    p, _ = pad_curves([np.asarray(c, dtype=np.float64) for c in ps])
    q, _ = pad_curves([np.asarray(c, dtype=np.float64) for c in qs])
    return _frechet_distance_padded(p, q, rel_tol, abs_tol)


def _frechet_distance_padded(
    p: np.ndarray,
    q: np.ndarray,
    rel_tol: float = 1e-9,
    abs_tol: float = 1e-12,
) -> np.ndarray:
    """Fréchet distance values for B last-vertex-padded pairs via lockstep
    bisection over the batched decider. Brackets: lo = max endpoint distance
    (a lower bound), hi = batched equal-time distance (upper bound, F8).
    Same tolerances and semantics as core.frechet_distance."""
    lo = np.maximum(
        np.hypot(p[:, 0, 0] - q[:, 0, 0], p[:, 0, 1] - q[:, 0, 1]),
        np.hypot(p[:, -1, 0] - q[:, -1, 0], p[:, -1, 1] - q[:, -1, 1]),
    )
    hi = np.maximum(etd_batch(p, q), lo)

    out = np.where(hi <= lo, lo, np.nan)
    # pairs already decided at their lower bound collapse to lo
    at_lo = decide_frechet_batch(p, q, lo)
    out = np.where(np.isnan(out) & at_lo, lo, out)

    # bisect only the still-active pairs each round (compaction): pairs
    # converge after different iteration counts, and a converged pair in
    # a lockstep batch would otherwise keep paying full sweeps
    idx = np.nonzero(np.isnan(out))[0]
    p, q, lo, hi = p[idx], q[idx], lo[idx], hi[idx]
    while idx.size:
        conv = hi - lo <= abs_tol + rel_tol * hi
        if conv.any():
            out[idx[conv]] = hi[conv]
            keep = ~conv
            idx, p, q, lo, hi = idx[keep], p[keep], q[keep], lo[keep], hi[keep]
            if idx.size == 0:
                break
        mid = 0.5 * (lo + hi)
        yes = decide_frechet_batch(p, q, mid)
        hi = np.where(yes, mid, hi)
        lo = np.where(yes, lo, mid)
    return out
