"""Agarwal curve simplification with certified error (K8/K10) — the build
half of the bddm simplification funnel.

Per reference detail/bddm/spatial_hash.hpp:

- ``agarwal_indices`` (K8, :1193-1257 ``agarwal_simplification`` +
  ``find_last_frechet_match``): greedy max-length prefix per vertex under
  equal-time-distance <= simplification_eps, found by double-&-search
  (:1146-1172) + binary int search (:1174-1187). The ETD between each
  original subchain and its replacement segment is <= eps, and
  concatenating the per-segment equal-time matchings yields a matching of
  the whole curve, so ``frechet(simplified, original) <= eps`` — the
  certificate the query-time funnel's triangle inequality needs.
- ``simplification_levels`` (K10, :549-585 ``make_simplifications``):
  per level, binary search on eps (exactly 10 simplify calls, bounds
  ``diagonal/100000 .. diagonal/2``, next level reuses the last tried
  value as its upper bound) targeting sizes ``max(20, n*{7,19,24,32}%)``
  with level 0 capped at 18 — constants verbatim.

Deviation from the reference (documented): query curves are simplified
with the same per-curve search instead of dataset-averaged eps ratios
(:630-663) — exactness is preserved because the stored eps is always the
one the simplification was built with; only the funnel's pruning power
differs marginally.
"""

from __future__ import annotations

import numpy as np

TARGET_FRACTIONS = (0.07, 0.19, 0.24, 0.32)
NUM_LEVELS = 4


def _prefix_arc(curve: np.ndarray) -> np.ndarray:
    out = np.zeros(curve.shape[0])
    if curve.shape[0] > 1:
        np.cumsum(
            np.sqrt(np.sum(np.diff(curve, axis=0) ** 2, axis=1)), out=out[1:]
        )
    return out


def _segment_etd(curve: np.ndarray, tp: np.ndarray, lo: int, hi: int) -> float:
    """ETD between subchain curve[lo..hi] and the straight segment
    (curve[lo], curve[hi]) under equal relative arc-length speed."""
    sub = curve[lo : hi + 1]
    rel = tp[lo : hi + 1] - tp[lo]
    total = rel[-1]
    if total > 0.0:
        rel = rel / total
    else:
        rel = np.zeros_like(rel)
    a = curve[lo]
    b = curve[hi]
    seg_pts = a[None, :] + rel[:, None] * (b - a)[None, :]
    d = sub - seg_pts
    return float(np.sqrt(np.max(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1])))


def agarwal_indices(
    curve: np.ndarray, eps: float, etd_cache: dict | None = None
) -> np.ndarray:
    """Vertex indices of the Agarwal simplification of ``curve`` at
    ``eps`` (always includes first and last vertex).

    ``etd_cache``: optional (prev, k) -> segment-ETD memo. The probed
    distances are eps-INDEPENDENT, so the K10 eps bisection (10 simplify
    calls per level over the same curve) re-probes many identical pairs —
    one shared cache across the tries removes the recomputation."""
    n = curve.shape[0]
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    tp = _prefix_arc(curve)
    idx = [0]
    prev = 0
    while prev < n - 1:
        start, end = prev + 1, n

        if etd_cache is None:

            def ok(k: int) -> bool:
                return _segment_etd(curve, tp, prev, k) <= eps

        else:

            def ok(k: int) -> bool:
                d = etd_cache.get((prev, k))
                if d is None:
                    d = _segment_etd(curve, tp, prev, k)
                    etd_cache[(prev, k)] = d
                return d <= eps

        # double-&-search (reference :1146-1172, base 2, step 1)
        k = start
        prevk = start
        iteration = 0
        while True:
            if k > end - 1:
                k = end - 1
            if not ok(k):
                # binary int search for the last satisfying index
                upper, lower = k, prevk
                while upper - lower > 1:
                    mid = lower + (upper - lower) // 2
                    if ok(mid):
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
    return np.asarray(idx, dtype=np.int64)


def simplification_levels(
    curve: np.ndarray,
    diagonal: float,
    levels: int = NUM_LEVELS,
    fractions: tuple[float, ...] = TARGET_FRACTIONS,
    min_pts: int = 20,
) -> list[tuple[np.ndarray, float]]:
    """[(indices, eps)] per level, reference K10 search (10 tries/level).

    ``fractions``/``min_pts`` default to the reference constants
    (bddm:552-559). For short curves the min-20 clamp makes the reference's
    four levels nearly identical; callers may pass coarser fractions
    (e.g. (0.07, 0.6)) to get genuinely distinct resolutions — exactness
    never depends on the choice (the stored eps is always the certificate).
    """
    if len(fractions) < levels:
        raise ValueError(
            f"need at least {levels} fractions, got {len(fractions)}: {fractions!r}"
        )
    n = curve.shape[0]
    targets = []
    for i in range(levels):
        t = max(min_pts, int(n * fractions[i]))
        targets.append(t)
    targets[0] = min(18, targets[0])

    lower0 = diagonal / 100000.0
    upper = diagonal / 2.0
    out = []
    etd_cache: dict = {}  # (prev, k) -> ETD, shared by all tries/levels
    for i in range(levels):
        tries = 0
        lo, hi = lower0, upper
        idx, used = None, None
        while True:
            avg = lo + (hi - lo) / 2.0
            idx = agarwal_indices(curve, avg, etd_cache)
            used = avg
            tries += 1
            if tries == 10:
                break
            if idx.shape[0] > targets[i]:
                lo = avg  # too many points -> coarser (larger eps)
            else:
                hi = avg
        upper = used  # next level refines below the last tried value
        out.append((idx, float(used)))
    return out
