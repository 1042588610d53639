"""K4: the Baldus/Bringmann divide-&-conquer free-space decider
(detail/bb/frechet_distance.hpp:58-304), scalar.

Recurses over free-space sub-rectangles carrying sorted lists of reachable
boundary intervals; prunes a whole rectangle positively when the mid-point
distance plus the longer half arc-lengths fits within d (:212-226), and
negatively when both boundary interval lists miss it. Interval merging
uses the reference's 1e-9 slack (``eps = 10e-10``, :59).

Semantics equal K5 (`core.decide_frechet`) — the engine standardizes on
the batched K5 for execution (SURVEY §2.6); this kernel exists for
reference parity and as an independent cross-check oracle, mirroring the
reference's own N-version testing (benchmark/test.py).
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

_EPS = 10e-10  # sic — the reference's merge slack (bb:59)
_EMPTY = (np.finfo(np.float64).max, np.finfo(np.float64).min)


def _is_empty(iv: tuple[float, float]) -> bool:
    return iv[0] >= iv[1]


def _dist2(p, q) -> float:
    dx = p[0] - q[0]
    dy = p[1] - q[1]
    return dx * dx + dy * dy


def _intersection_interval(center, radius, s0, s1):
    """[lambda1, lambda2] with |s0 + l*(s1-s0) - center| <= radius,
    clipped to [0,1]; empty -> _EMPTY (bb:77-132)."""
    vx = s1[0] - s0[0]
    vy = s1[1] - s0[1]
    fx = s0[0] - center[0]
    fy = s0[1] - center[1]
    a = vx * vx + vy * vy
    b = 2.0 * (fx * vx + fy * vy)
    c = fx * fx + fy * fy - radius * radius
    if a == 0.0:
        return (0.0, 1.0) if _dist2(s0, center) <= radius * radius else _EMPTY
    disc = (b / (2.0 * a)) ** 2 - c / a
    if disc < 0.0:
        return _EMPTY
    sq = np.sqrt(disc)
    l1 = -b / (2.0 * a) - sq
    l2 = -b / (2.0 * a) + sq
    if l2 < 0.0 or l1 > 1.0:
        return _EMPTY
    return (max(l1, 0.0), min(l2, 1.0))


class _Curve:
    def __init__(self, t: np.ndarray):
        self.t = np.asarray(t, dtype=np.float64)
        seg = np.sqrt(np.sum(np.diff(self.t, axis=0) ** 2, axis=1))
        self.prefix = np.concatenate([[0.0], np.cumsum(seg)])

    def curve_length(self, i: int, j: int) -> float:
        return self.prefix[j] - self.prefix[i]

    def __len__(self):
        return self.t.shape[0]


def _get_reachable_a(i, j, a, b, d):
    s, e = _intersection_interval(a[i], d, b[j], b[j + 1])
    return (s + j, e + j)


def _merge(v: list, iv) -> None:
    if _is_empty(iv):
        return
    if v and iv[0] - _EPS <= v[-1][1]:
        v[-1] = (v[-1][0], iv[1])
    else:
        v.append(iv)


def _last_reachable_from_start(a, b, d):
    j = 0
    while j < b.shape[0] - 2 and _dist2(a[0], b[j + 1]) <= d * d:
        j += 1
    return _get_reachable_a(0, j, a, b, d)[1]


def _reachable_intervals(i_min, i_max, j_min, j_max, ca, cb, d, rb, ra, rb_out, ra_out):
    # find the interval in rb covering [j_min, j_max] (sorted, bisect)
    tb = _EMPTY
    k = bisect_right(rb, (j_max, np.finfo(np.float64).min))
    if k > 0:
        cand = rb[k - 1]
        if cand[0] <= j_max and cand[1] >= j_min:
            tb = cand
    ta = _EMPTY
    k = bisect_right(ra, (i_max, np.finfo(np.float64).min))
    if k > 0:
        cand = ra[k - 1]
        if cand[0] <= i_max and cand[1] >= i_min:
            ta = cand

    if _is_empty(tb) and _is_empty(ta):
        return
    t1, t2 = ca.t, cb.t

    # positive prune: mid-distance + longer half arc-lengths fits in d
    if (
        tb[0] <= j_min + _EPS
        and tb[1] >= j_max - _EPS
        and ta[0] <= i_min + _EPS
        and ta[1] >= i_max - _EPS
    ):
        i_mid = (i_min + 1 + i_max) // 2
        j_mid = (j_min + 1 + j_max) // 2
        if (
            np.sqrt(_dist2(t1[i_mid], t2[j_mid]))
            + max(ca.curve_length(i_min + 1, i_mid), ca.curve_length(i_mid, i_max))
            + max(cb.curve_length(j_min + 1, j_mid), cb.curve_length(j_mid, j_max))
            <= d
        ):
            _merge(rb_out, (float(j_min), float(j_max)))
            _merge(ra_out, (float(i_min), float(i_max)))
            return

    if i_min == i_max - 1 and j_min == j_max - 1:
        aa = _get_reachable_a(i_max, j_min, t1, t2, d)
        bb = _get_reachable_a(j_max, i_min, t2, t1, d)
        if _is_empty(ta):
            aa = (max(aa[0], tb[0]), aa[1])
        elif _is_empty(tb):
            bb = (max(bb[0], ta[0]), bb[1])
        _merge(rb_out, aa)
        _merge(ra_out, bb)
    else:
        if j_max - j_min > i_max - i_min:
            ra_middle: list = []
            split = (j_max + j_min) // 2
            _reachable_intervals(
                i_min, i_max, j_min, split, ca, cb, d, rb, ra, rb_out, ra_middle
            )
            _reachable_intervals(
                i_min, i_max, split, j_max, ca, cb, d, rb, ra_middle, rb_out, ra_out
            )
        else:
            rb_middle: list = []
            split = (i_max + i_min) // 2
            _reachable_intervals(
                i_min, split, j_min, j_max, ca, cb, d, rb, ra, rb_middle, ra_out
            )
            _reachable_intervals(
                split, i_max, j_min, j_max, ca, cb, d, rb_middle, ra, rb_out, ra_out
            )


def decide_frechet_bb(p: np.ndarray, q: np.ndarray, d: float) -> bool:
    """True iff continuous Fréchet distance <= d; bb D&C semantics
    (is_bounded_by, bb:269-304)."""
    t1 = np.asarray(p, dtype=np.float64)
    t2 = np.asarray(q, dtype=np.float64)
    d = float(d)
    if _dist2(t1[0], t2[0]) > d * d or _dist2(t1[-1], t2[-1]) > d * d:
        return False
    if t1.shape[0] == 1 and t2.shape[0] == 1:
        return True
    if t1.shape[0] == 1:
        return float(np.max(np.sum((t2 - t1[0]) ** 2, axis=1))) <= d * d
    if t2.shape[0] == 1:
        return float(np.max(np.sum((t1 - t2[0]) ** 2, axis=1))) <= d * d

    ca, cb = _Curve(t1), _Curve(t2)
    ra = [(0.0, _last_reachable_from_start(t1, t2, d))]
    rb = [(0.0, _last_reachable_from_start(t2, t1, d))]
    ra_out: list = []
    rb_out: list = []
    _reachable_intervals(
        0, len(ca) - 1, 0, len(cb) - 1, ca, cb, d, ra, rb, ra_out, rb_out
    )
    return bool(ra_out) and ra_out[-1][1] >= len(cb) - 1.5
