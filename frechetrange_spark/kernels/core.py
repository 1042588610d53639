"""Core Fréchet kernels: free-space intervals, the exact decision procedure,
equal-time-distance upper bound, greedy upper bound, and the distance value
via bisection over the decider.

Semantics follow the GIS Cup 2017 reference deciders (all three are exact and
agree). Parity anchors, cited against /root/reference:

- line–circle intersection interval (the one shared scalar kernel the
  reference keeps three copies of):
  detail/dv/frechet_distance.hpp:399-442, detail/bb/frechet_distance.hpp:78-132,
  detail/bddm/spatial_hash.hpp:371-421. Points at distance exactly eps are
  FREE (non-strict <=).
- endpoint reject is strict ``>``: detail/dv/frechet_distance.hpp:44-47.
- single-point curves: max vertex distance, detail/dv/frechet_distance.hpp:53-55.
- the decision itself is the classic Alt–Godau free-space reachability,
  implemented column-wise like detail/dv/frechet_distance.hpp:221-373
  ("frontline" of left-boundary reachability + bottom chain, early exit when
  a column is fully unreachable).
- equal-time distance (upper bound): detail/bddm/spatial_hash.hpp:253-362 —
  dog-leash length when both curves are traversed at equal relative
  arc-length speed; exact at vertex events because pairwise distance of two
  linearly-moving points is convex in time.
- distance value = exponential growth + bisection over the decider, as in
  the reference's samples/plain.cpp:47-60 and python-nodeps/frechet.cpp:21-57.

All functions take float64 ``(n, 2)`` ndarrays. Everything is vectorized
over one curve dimension per step; the only Python-level loop is over the
columns of the free-space diagram (and a cheap per-row chain inside it).
"""

from __future__ import annotations

import numpy as np

_INF = np.inf


def _dist2(p: np.ndarray, q: np.ndarray) -> float:
    d = p - q
    return float(d[0] * d[0] + d[1] * d[1])


def free_intervals_point_vs_segments(
    point: np.ndarray, seg_start: np.ndarray, seg_end: np.ndarray, eps2: float
) -> tuple[np.ndarray, np.ndarray]:
    """Free sub-intervals of t in [0,1] with |s0 + t*(s1-s0) - point|^2 <= eps2.

    Vectorized over k segments. Returns (lo, hi); empty intervals are
    encoded lo=+inf, hi=-inf. Degenerate (zero-length) segments are fully
    free iff the single point is within eps (reference dv:409-415).
    """
    d = seg_end - seg_start  # (k,2)
    f = seg_start - point  # (k,2)
    a = d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]
    b = 2.0 * (f[:, 0] * d[:, 0] + f[:, 1] * d[:, 1])
    c = f[:, 0] * f[:, 0] + f[:, 1] * f[:, 1] - eps2
    return _solve_quadratic_interval(a, b, c)


def free_intervals_segment_vs_points(
    seg_start: np.ndarray, seg_end: np.ndarray, points: np.ndarray, eps2: float
) -> tuple[np.ndarray, np.ndarray]:
    """Free sub-intervals of t with |s0 + t*(s1-s0) - points[k]|^2 <= eps2."""
    d = seg_end - seg_start  # (2,)
    f = seg_start[None, :] - points  # (k,2)
    a = np.full(points.shape[0], d[0] * d[0] + d[1] * d[1])
    b = 2.0 * (f[:, 0] * d[0] + f[:, 1] * d[1])
    c = f[:, 0] * f[:, 0] + f[:, 1] * f[:, 1] - eps2
    return _solve_quadratic_interval(a, b, c)


def _solve_quadratic_interval(
    a: np.ndarray, b: np.ndarray, c: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Solve a*t^2 + b*t + c <= 0 clipped to [0,1]; empty -> (+inf, -inf)."""
    lo = np.full_like(c, _INF)
    hi = np.full_like(c, -_INF)

    degen = a <= 0.0
    if degen.any():
        ok = degen & (c <= 0.0)
        lo[ok] = 0.0
        hi[ok] = 1.0

    nd = ~degen
    if nd.any():
        disc = b * b - 4.0 * a * c
        real = nd & (disc >= 0.0)
        if real.any():
            sq = np.sqrt(np.where(real, disc, 0.0))
            t1 = (-b - sq) / (2.0 * np.where(nd, a, 1.0))
            t2 = (-b + sq) / (2.0 * np.where(nd, a, 1.0))
            ok = real & (t1 <= 1.0) & (t2 >= 0.0)
            lo[ok] = np.clip(t1[ok], 0.0, 1.0)
            hi[ok] = np.clip(t2[ok], 0.0, 1.0)
    return lo, hi


def _max_dist2_point_to_vertices(point: np.ndarray, curve: np.ndarray) -> float:
    d = curve - point[None, :]
    return float(np.max(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]))


def decide_frechet(p: np.ndarray, q: np.ndarray, eps: float) -> bool:
    """True iff the continuous Fréchet distance between polylines p, q <= eps.

    Column sweep over the free-space diagram (x-axis = p's segments,
    y-axis = q's segments), carrying reachability intervals of the current
    column's left boundaries plus the bottom-edge chain. Mirrors
    detail/dv/frechet_distance.hpp:221-373 in shape; interval math is
    vectorized over the row dimension per column.
    """
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    n, m = p.shape[0], q.shape[0]
    if n == 0 or m == 0:
        return False
    eps2 = float(eps) * float(eps)

    # F1 endpoint check (strict > rejects; dv:44-47).
    if _dist2(p[0], q[0]) > eps2 or _dist2(p[-1], q[-1]) > eps2:
        return False
    # F10 single-point cases (dv:53-55, 88-98).
    if n == 1 and m == 1:
        return True  # endpoint check already passed
    if n == 1:
        return _max_dist2_point_to_vertices(p[0], q) <= eps2
    if m == 1:
        return _max_dist2_point_to_vertices(q[0], p) <= eps2

    # Left boundaries of column 0: chain up the left edge from the origin.
    fl_lo, fl_hi = free_intervals_point_vs_segments(p[0], q[:-1], q[1:], eps2)
    full = (fl_lo <= 0.0) & (fl_hi >= 1.0)
    # prefix_ok[j] == all of segments 0..j-1 fully free
    prefix_ok = np.ones(m - 1, dtype=bool)
    if m > 2:
        prefix_ok[1:] = np.cumprod(full[:-1]).astype(bool)
    reach = prefix_ok & (fl_lo <= 0.0)
    lr_lo = np.where(reach, 0.0, _INF)
    lr_hi = np.where(reach, fl_hi, -_INF)

    bottom_prefix_ok = True  # bottom edge fully free through columns < i
    br_lo_top = _INF  # BR(i, m-1).lo of the last processed column
    fh_hi_top = -_INF

    for i in range(n - 1):
        # Horizontal boundary intervals of column i: segment p[i]->p[i+1]
        # vs every vertex of q.
        fh_lo, fh_hi = free_intervals_segment_vs_points(p[i], p[i + 1], q, eps2)

        # Bottom-edge entry for cell (i, 0).
        if bottom_prefix_ok and fh_lo[0] <= 0.0:
            blo = 0.0
        else:
            blo = _INF
        bottom_prefix_ok = bottom_prefix_ok and fh_lo[0] <= 0.0 and fh_hi[0] >= 1.0

        # BR chain up the column (the only sequential dependency).
        left_ok = lr_lo <= lr_hi
        br_lo = np.empty(m, dtype=np.float64)
        br_lo[0] = blo
        for j in range(m - 1):
            if left_ok[j]:
                nxt = fh_lo[j + 1]
            elif br_lo[j] <= 1.0:  # nonempty bottom entry
                nxt = max(fh_lo[j + 1], br_lo[j])
                if nxt > fh_hi[j + 1]:
                    nxt = _INF
            else:
                nxt = _INF
            br_lo[j + 1] = nxt

        br_lo_top = br_lo[m - 1]
        fh_hi_top = fh_hi[m - 1]

        if i == n - 2:
            break

        # Right boundaries -> next column's left boundaries (vectorized).
        fv_lo, fv_hi = free_intervals_point_vs_segments(p[i + 1], q[:-1], q[1:], eps2)
        bottom_ok = br_lo[:-1] <= 1.0
        entry_lo = np.where(bottom_ok, 0.0, np.where(left_ok, lr_lo, _INF))
        new_lo = np.maximum(fv_lo, entry_lo)
        new_hi = fv_hi
        dead = new_lo > new_hi
        lr_lo = np.where(dead, _INF, new_lo)
        lr_hi = np.where(dead, -_INF, new_hi)

        # Early exit: nothing reachable in the next column and the bottom
        # edge is already blocked (dv:334-337).
        if not bottom_prefix_ok and dead.all():
            return False

    # Accept iff the top-right corner is reachable: via the top boundary of
    # the last cell (1 in BR(n-2, m-1)) or via its right boundary.
    if br_lo_top <= 1.0 and fh_hi_top >= 1.0:
        return True
    # Right boundary of the last column's top cell: recompute reachability
    # of cell (n-2, m-2)'s right boundary.
    fv_lo, fv_hi = free_intervals_point_vs_segments(p[n - 1], q[:-1], q[1:], eps2)
    j = m - 2
    left_ok_last = lr_lo[j] <= lr_hi[j]
    bottom_ok_last = br_lo[j] <= 1.0 if m >= 2 else False
    if bottom_ok_last:
        entry = 0.0
    elif left_ok_last:
        entry = lr_lo[j]
    else:
        entry = _INF
    rlo = max(fv_lo[j], entry)
    return bool(rlo <= fv_hi[j] and fv_hi[j] >= 1.0 and rlo <= 1.0)


def _prefix_lengths(curve: np.ndarray) -> np.ndarray:
    seg = np.sqrt(np.sum(np.diff(curve, axis=0) ** 2, axis=1))
    out = np.empty(curve.shape[0])
    out[0] = 0.0
    np.cumsum(seg, out=out[1:])
    return out


def equal_time_distance(p: np.ndarray, q: np.ndarray) -> float:
    """Dog-leash length when both curves are traversed at equal relative
    arc-length speed — an upper bound on the Fréchet distance
    (detail/bddm/spatial_hash.hpp:253-362, F8).

    Exact at the union of vertex event times because the distance between
    two linearly-moving points is convex in time.
    """
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    tp = _prefix_lengths(p)
    tq = _prefix_lengths(q)
    lp, lq = tp[-1], tq[-1]
    if lp <= 0.0 and lq <= 0.0:
        return float(np.sqrt(_dist2(p[0], q[0])))
    rp = tp / lp if lp > 0.0 else np.zeros_like(tp)
    rq = tq / lq if lq > 0.0 else np.zeros_like(tq)
    times = np.union1d(rp, rq)
    px = np.interp(times, rp, p[:, 0])
    py = np.interp(times, rp, p[:, 1])
    qx = np.interp(times, rq, q[:, 0])
    qy = np.interp(times, rq, q[:, 1])
    # Degenerate zero-length curve: stay at the single location.
    if lp <= 0.0:
        px[:] = p[0, 0]
        py[:] = p[0, 1]
    if lq <= 0.0:
        qx[:] = q[0, 0]
        qy[:] = q[0, 1]
    d2 = (px - qx) ** 2 + (py - qy) ** 2
    # Endpoints must match endpoints under equal-time traversal.
    return float(np.sqrt(np.max(d2)))


def greedy_upper_bound(p: np.ndarray, q: np.ndarray) -> float:
    """Greedy monotone alignment upper bound (F4,
    detail/bb/spatial_index.hpp:251-278): walk both curves, always advancing
    the step (p+1, q), (p, q+1) or (p+1, q+1) that minimizes the next pair
    distance; the max distance seen bounds the Fréchet distance from above.
    """
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    i, j = 0, 0
    n, m = p.shape[0], q.shape[0]
    best = _dist2(p[0], q[0])
    while i < n - 1 or j < m - 1:
        a = _dist2(p[i + 1], q[j]) if i < n - 1 else _INF
        b = _dist2(p[i], q[j + 1]) if j < m - 1 else _INF
        c = _dist2(p[i + 1], q[j + 1]) if (i < n - 1 and j < m - 1) else _INF
        step = min(a, b, c)
        if step == c:
            i += 1
            j += 1
        elif step == a:
            i += 1
        else:
            j += 1
        if step > best:
            best = step
    return float(np.sqrt(best))


def positive_filter(p: np.ndarray, q: np.ndarray, eps: float) -> bool:
    """F7 positive greedy filter (dv/frechet_distance.hpp:100-156, compiled
    out by default upstream): True PROVES frechet(p, q) <= eps, assuming the
    endpoint pairs were already checked (F1). False is inconclusive.

    Soundness of the reference's d12-only check: in the advance-one
    branches the branch condition implies the chosen pair's distance is
    <= d12 <= eps (if d12 were smaller than both single steps the diagonal
    branch would have been taken), so every matched pair is within eps.
    """
    t1 = np.asarray(p, dtype=np.float64)
    t2 = np.asarray(q, dtype=np.float64)
    eps2 = float(eps) * float(eps)
    i1 = i2 = 0
    n1, n2 = t1.shape[0], t2.shape[0]
    while i1 < n1 - 1 and i2 < n2 - 1:
        d1 = _dist2(t1[i1 + 1], t2[i2])
        d2 = _dist2(t1[i1], t2[i2 + 1])
        d12 = _dist2(t1[i1 + 1], t2[i2 + 1])
        if d12 > eps2:
            return False
        if d12 < d1 and d12 < d2:
            i1 += 1
            i2 += 1
        elif d1 < d2:
            i1 += 1
        else:
            i2 += 1
    while i1 < n1 - 2:
        i1 += 1
        if _dist2(t1[i1], t2[i2]) > eps2:
            return False
    while i2 < n2 - 2:
        i2 += 1
        if _dist2(t1[i1], t2[i2]) > eps2:
            return False
    return True


def match_inner_points_monotonously(
    points: np.ndarray, segments: np.ndarray, eps: float
) -> bool:
    """F6 (detail/dv/frechet_distance.hpp:164-213): True iff the inner
    points of ``points`` can be matched monotonically onto the segment
    chain ``segments`` within eps. False is a definite NO for the Fréchet
    decision (applied in both directions by the reference's is_bounded_by
    before the DP, :60-66); True is inconclusive."""
    points = np.asarray(points, dtype=np.float64)
    segments = np.asarray(segments, dtype=np.float64)
    points_end = points.shape[0] - 1
    num_segments = segments.shape[0] - 1
    if points_end <= 1 or num_segments == 0:
        return True
    eps2 = float(eps) * float(eps)
    point_idx = 1
    seg_idx = 0
    segment_part = 0.0
    while True:
        s0 = segments[seg_idx]
        d = segments[seg_idx + 1] - s0
        f = s0 - points[point_idx]
        a = d[0] * d[0] + d[1] * d[1]
        b = 2.0 * (f[0] * d[0] + f[1] * d[1])
        c = f[0] * f[0] + f[1] * f[1] - eps2
        if a <= 0.0:
            begin, end = (0.0, 1.0) if c <= 0.0 else (_INF, -_INF)
        else:
            disc = b * b - 4.0 * a * c
            if disc < 0.0:
                begin, end = _INF, -_INF
            else:
                sq = np.sqrt(disc)
                begin = (-b - sq) / (2.0 * a)
                end = (-b + sq) / (2.0 * a)
        if begin <= 1.0 and end >= segment_part:
            if segment_part < begin:
                segment_part = begin
            point_idx += 1
            if point_idx == points_end:
                return True
        else:
            seg_idx += 1
            segment_part = 0.0
            if seg_idx == num_segments:
                return False


def _next_close_point(
    t: np.ndarray, prefix: np.ndarray, i: int, p: np.ndarray, d: float
) -> int:
    """First index k >= i with |t[k] - p| <= d, found by exponential
    ("galloping") search over the prefix arc lengths (F5 helper,
    detail/bb/spatial_index.hpp:285-310 ``nextclosepoint``). Returns
    len(t) when no such point exists."""
    n = t.shape[0]
    delta = 1
    k = i
    while True:
        if k == n - 1:
            return k if _dist2(t[k], p) <= d * d else n
        delta = min(delta, n - 1 - k)
        # points within the next `delta` arc length cannot be close enough
        if np.sqrt(_dist2(p, t[k])) - (prefix[k + delta] - prefix[k]) > d:
            k += delta
            delta *= 2
        elif delta > 1:
            delta //= 2
        else:
            return k


def negfilter(p: np.ndarray, q: np.ndarray, eps: float) -> bool:
    """F5 negative filter (detail/bb/spatial_index.hpp:316-337): tries to
    PROVE frechet(p, q) > eps. True = proof found (definite NO); False is
    inconclusive. Every sampled point of one curve must have a monotone
    close point on the other."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    pre_p = _prefix_lengths(p)
    pre_q = _prefix_lengths(q)
    delta = max(p.shape[0], q.shape[0]) - 1
    while delta >= 1:
        i = 0
        for j in range(0, q.shape[0], delta):
            i = _next_close_point(p, pre_p, i, q[j], eps)
            if i >= p.shape[0]:
                return True
        j = 0
        for i2 in range(0, p.shape[0], delta):
            j = _next_close_point(q, pre_q, j, p[i2], eps)
            if j >= q.shape[0]:
                return True
        delta //= 2
    return False


def frechet_distance(
    p: np.ndarray,
    q: np.ndarray,
    rel_tol: float = 1e-9,
    abs_tol: float = 1e-12,
) -> float:
    """Fréchet distance value via bisection over the exact decider (K12,
    samples/plain.cpp:47-60). Lower bound: max endpoint distance; upper
    bound: equal-time distance (always >= the true value).
    """
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    lo = max(np.sqrt(_dist2(p[0], q[0])), np.sqrt(_dist2(p[-1], q[-1])))
    hi = equal_time_distance(p, q)
    if hi <= lo:
        return lo
    if decide_frechet(p, q, lo):
        return lo
    while hi - lo > abs_tol + rel_tol * hi:
        mid = 0.5 * (lo + hi)
        if decide_frechet(p, q, mid):
            hi = mid
        else:
            lo = mid
    return hi
