"""Kernel unit tests: the reference's known-answer cases plus property
checks (see SURVEY.md §5).

Known answers, from /root/reference:
- python-package/test.py:11-19 / r-package/tests.R:143-147:
  t1=[(1,0),(2,0),(4,0),(5,0)] vs t2=[(1,0),(3,3),(5,0)] has dF = 3.
- samples/plain.cpp:31-60: [(0,0),(10,0)] vs [(0,1),(5,10),(10,1)] has dF = 10.
- r-package/tests.R:137: parallel diagonals offset by (1,1) -> dF = sqrt(2).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frechetrange_spark.kernels import (
    decide_frechet,
    equal_time_distance,
    frechet_distance,
    greedy_upper_bound,
)

T1 = np.array([[1.0, 0.0], [2.0, 0.0], [4.0, 0.0], [5.0, 0.0]])
T2 = np.array([[1.0, 0.0], [3.0, 3.0], [5.0, 0.0]])


class TestKnownAnswers:
    def test_gis_cup_pair_decisions(self):
        assert decide_frechet(T1, T2, 3.01)
        assert not decide_frechet(T1, T2, 2.99)
        # symmetric
        assert decide_frechet(T2, T1, 3.01)
        assert not decide_frechet(T2, T1, 2.99)

    def test_gis_cup_pair_distance(self):
        assert frechet_distance(T1, T2) == pytest.approx(3.0, abs=1e-6)

    def test_segment_vs_triangle(self):
        a = np.array([[0.0, 0.0], [10.0, 0.0]])
        b = np.array([[0.0, 1.0], [5.0, 10.0], [10.0, 1.0]])
        assert frechet_distance(a, b) == pytest.approx(10.0, abs=1e-6)
        assert decide_frechet(a, b, 10.0 + 1e-9)
        assert not decide_frechet(a, b, 10.0 - 1e-6)

    def test_parallel_diagonals(self):
        a = np.array([[float(i), float(i)] for i in range(5)])
        b = a + np.array([1.0, 1.0])
        assert frechet_distance(a, b) == pytest.approx(np.sqrt(2.0), abs=1e-6)

    def test_identical_curves(self):
        assert decide_frechet(T1, T1, 0.0)
        assert frechet_distance(T2, T2) == 0.0

    def test_single_point_cases(self):
        pt = np.array([[2.0, 0.0]])
        # max vertex distance from (2,0) to T2 is to (3,3) -> sqrt(10)
        d = np.sqrt(10.0)
        assert decide_frechet(pt, T2, d + 1e-9)
        assert not decide_frechet(pt, T2, d - 1e-9)
        assert decide_frechet(pt, pt, 0.0)
        assert not decide_frechet(pt, np.array([[3.0, 0.0]]), 0.5)

    def test_endpoint_reject_is_strict(self):
        # dv:44-47 rejects on dist > eps: equality is accepted.
        a = np.array([[0.0, 0.0], [1.0, 0.0]])
        b = np.array([[0.0, 1.0], [1.0, 1.0]])
        assert decide_frechet(a, b, 1.0)
        assert not decide_frechet(a, b, 1.0 - 1e-12)

    def test_duplicate_points(self):
        a = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
        b = np.array([[0.0, 0.0], [1.0, 0.0]])
        assert decide_frechet(a, b, 1e-12)

    def test_backtracking_curves(self):
        # A curve that doubles back: monotonicity forces a larger leash.
        a = np.array([[0.0, 0.0], [10.0, 0.0]])
        b = np.array([[0.0, 0.0], [6.0, 0.0], [4.0, 0.0], [10.0, 0.0]])
        d = frechet_distance(a, b)
        assert d == pytest.approx(1.0, abs=1e-6)


def _rand_curve(rng, n):
    steps = rng.standard_normal((n, 2))
    return np.cumsum(steps, axis=0)


class TestProperties:
    def test_monotone_in_eps(self):
        rng = np.random.default_rng(7)
        for _ in range(25):
            a = _rand_curve(rng, rng.integers(2, 12))
            b = _rand_curve(rng, rng.integers(2, 12))
            d = frechet_distance(a, b)
            assert decide_frechet(a, b, d * (1 + 1e-6) + 1e-9)
            if d > 1e-6:
                assert not decide_frechet(a, b, d * (1 - 1e-6) - 1e-9)

    def test_upper_bounds_hold(self):
        rng = np.random.default_rng(11)
        for _ in range(25):
            a = _rand_curve(rng, rng.integers(2, 15))
            b = _rand_curve(rng, rng.integers(2, 15))
            d = frechet_distance(a, b)
            # frechet_distance returns the bisection hi, which can overshoot
            # the true value by abs_tol + rel_tol*hi — allow that slack.
            slack = 1e-9 + 2e-9 * d
            assert equal_time_distance(a, b) >= d - slack
            assert greedy_upper_bound(a, b) >= d - slack

    def test_symmetry(self):
        rng = np.random.default_rng(13)
        for _ in range(15):
            a = _rand_curve(rng, rng.integers(2, 10))
            b = _rand_curve(rng, rng.integers(2, 10))
            assert frechet_distance(a, b) == pytest.approx(
                frechet_distance(b, a), rel=1e-6, abs=1e-9
            )

    def test_triangle_like_lower_bound(self):
        # dF >= max(endpoint distances) always.
        rng = np.random.default_rng(17)
        for _ in range(15):
            a = _rand_curve(rng, rng.integers(2, 10))
            b = _rand_curve(rng, rng.integers(2, 10))
            lb = max(
                np.linalg.norm(a[0] - b[0]), np.linalg.norm(a[-1] - b[-1])
            )
            assert frechet_distance(a, b) >= lb - 1e-9

    def test_discrete_frechet_sandwich(self):
        # continuous dF <= discrete dF; discrete dF on densified curves
        # approaches continuous. Independent O(nm) DP oracle.
        def discrete(a, b):
            n, m = len(a), len(b)
            d = np.sqrt(
                ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
            )
            ca = np.full((n, m), np.inf)
            ca[0, 0] = d[0, 0]
            for i in range(n):
                for j in range(m):
                    if i == 0 and j == 0:
                        continue
                    prev = min(
                        ca[i - 1, j] if i else np.inf,
                        ca[i, j - 1] if j else np.inf,
                        ca[i - 1, j - 1] if i and j else np.inf,
                    )
                    ca[i, j] = max(prev, d[i, j])
            return ca[-1, -1]

        def densify(c, k=8):
            out = [c[0]]
            for i in range(len(c) - 1):
                for s in range(1, k + 1):
                    out.append(c[i] + (c[i + 1] - c[i]) * s / k)
            return np.array(out)

        rng = np.random.default_rng(23)
        for _ in range(10):
            a = _rand_curve(rng, rng.integers(2, 8))
            b = _rand_curve(rng, rng.integers(2, 8))
            cont = frechet_distance(a, b)
            disc_dense = discrete(densify(a), densify(b))
            seg = max(
                np.sqrt((np.diff(a, axis=0) ** 2).sum(-1)).max(),
                np.sqrt((np.diff(b, axis=0) ** 2).sum(-1)).max(),
            )
            slack = 1e-9 + 2e-9 * cont
            assert cont <= disc_dense + slack
            assert disc_dense <= cont + seg / 8 + slack


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-50, 50, allow_nan=False),
            st.floats(-50, 50, allow_nan=False),
        ),
        min_size=2,
        max_size=8,
    ),
    st.lists(
        st.tuples(
            st.floats(-50, 50, allow_nan=False),
            st.floats(-50, 50, allow_nan=False),
        ),
        min_size=2,
        max_size=8,
    ),
)
def test_hypothesis_decide_consistent_with_value(pa, pb):
    a = np.array(pa, dtype=np.float64)
    b = np.array(pb, dtype=np.float64)
    d = frechet_distance(a, b)
    assert decide_frechet(a, b, d + max(1e-6, d * 1e-6))
    if d > 1e-5:
        assert not decide_frechet(a, b, d * 0.999 - 1e-9)


class TestBatchKernels:
    """Pair-batched kernels must agree exactly with the scalar ones
    (the scalar ones carry the reference-parity semantics)."""

    def test_decide_batch_agrees_with_scalar(self):
        from frechetrange_spark.kernels.batch import decide_frechet_pairs

        rng = np.random.default_rng(11)
        ps, qs, eps = [], [], []
        for _ in range(300):
            n, m = rng.integers(1, 70), rng.integers(1, 70)
            p = np.cumsum(rng.normal(size=(n, 2)), axis=0)
            q = np.cumsum(rng.normal(size=(m, 2)), axis=0) + rng.normal(scale=2, size=2)
            if n > 3 and rng.random() < 0.25:
                p[2] = p[1]  # consecutive duplicate point
            ps.append(p)
            qs.append(q)
            eps.append(rng.uniform(0.3, 12.0))
        eps = np.array(eps)
        got = decide_frechet_pairs(ps, qs, eps)
        exp = np.array([decide_frechet(p, q, e) for p, q, e in zip(ps, qs, eps)])
        assert (got == exp).all()

    def test_decide_batch_near_critical_eps(self):
        from frechetrange_spark.kernels.batch import decide_frechet_pairs

        rng = np.random.default_rng(12)
        ps = [np.cumsum(rng.normal(size=(rng.integers(2, 40), 2)), axis=0) for _ in range(80)]
        qs = [np.cumsum(rng.normal(size=(rng.integers(2, 40), 2)), axis=0) for _ in range(80)]
        d = np.array([frechet_distance(p, q) for p, q in zip(ps, qs)])
        assert decide_frechet_pairs(ps, qs, d * 1.0001 + 1e-9).all()
        assert not decide_frechet_pairs(ps, qs, np.maximum(d * 0.999 - 1e-9, 0.0)).any()

    def test_distance_batch_agrees_with_scalar(self):
        from frechetrange_spark.kernels.batch import frechet_distance_pairs

        rng = np.random.default_rng(13)
        ps = [np.cumsum(rng.normal(size=(rng.integers(2, 50), 2)), axis=0) for _ in range(60)]
        qs = [np.cumsum(rng.normal(size=(rng.integers(2, 50), 2)), axis=0) for _ in range(60)]
        got = frechet_distance_pairs(ps, qs)
        exp = np.array([frechet_distance(p, q) for p, q in zip(ps, qs)])
        np.testing.assert_allclose(got, exp, rtol=1e-7, atol=1e-9)

    def test_known_answer_through_batch(self):
        from frechetrange_spark.kernels.batch import decide_frechet_pairs

        # python-package/test.py:11-19 — delta_F = 3
        t1 = np.array([[1.0, 0.0], [2.0, 0.0], [4.0, 0.0], [5.0, 0.0]])
        t2 = np.array([[1.0, 0.0], [3.0, 3.0], [5.0, 0.0]])
        assert decide_frechet_pairs([t1], [t2], np.array([3.01]))[0]
        assert not decide_frechet_pairs([t1], [t2], np.array([2.99]))[0]


def test_f6_monotone_matching_never_contradicts():
    """F6 is a NO-prover: whenever it rejects (either direction), the
    exact decider must also reject (dv/frechet_distance.hpp:60-66)."""
    from frechetrange_spark.kernels import match_inner_points_monotonously

    rng = np.random.default_rng(41)
    fired = 0
    for _ in range(200):
        p = np.cumsum(rng.normal(size=(rng.integers(2, 30), 2)), axis=0)
        q = np.cumsum(rng.normal(size=(rng.integers(2, 30), 2)), axis=0)
        q += rng.normal(scale=2.0, size=2)
        eps = rng.uniform(0.3, 6.0)
        ok = match_inner_points_monotonously(
            p, q, eps
        ) and match_inner_points_monotonously(q, p, eps)
        if not ok:
            fired += 1
            assert not decide_frechet(p, q, eps)
    assert fired > 0


class TestAlternateDeciders:
    """K4 (bb divide-&-conquer) and K6 (bddm CFDQ, with K9 portals) must
    agree with the canonical K5 decider — the reference's own oracle is
    N-version agreement (benchmark/test.py)."""

    def _pairs(self, n, seed, lo=2, hi=60):
        rng = np.random.default_rng(seed)
        out = []
        for _ in range(n):
            p = np.cumsum(rng.normal(size=(rng.integers(lo, hi), 2)), axis=0)
            q = np.cumsum(rng.normal(size=(rng.integers(lo, hi), 2)), axis=0)
            q += rng.normal(scale=2.0, size=2)
            out.append((p, q))
        return out

    def test_bb_agrees_with_k5(self):
        from frechetrange_spark.kernels.bb_decider import decide_frechet_bb

        for p, q in self._pairs(150, 51, lo=1):
            d = frechet_distance(p, q)
            for e in (d * 1.001 + 1e-9, max(d * 0.999 - 1e-9, 0.0)):
                assert decide_frechet_bb(p, q, e) == decide_frechet(p, q, e)

    def test_cfdq_agrees_with_k5(self):
        from frechetrange_spark.kernels.cfdq import decide_frechet_cfdq

        for p, q in self._pairs(150, 52):
            d = frechet_distance(p, q)
            for e in (d * 1.001 + 1e-9, max(d * 0.999 - 1e-9, 0.0)):
                assert decide_frechet_cfdq(p, q, e) == decide_frechet(p, q, e)

    def test_cfdq_with_portals_agrees(self):
        from frechetrange_spark.kernels.cfdq import (
            agarwal_with_portals,
            compile_portals,
            decide_frechet_cfdq,
        )

        for p, q in self._pairs(80, 53, lo=10, hi=80):
            _, ports = agarwal_with_portals(p, 1.0)
            pmap = compile_portals([ports])
            d = frechet_distance(p, q)
            for mult in (1.5, 1.001, 0.999, 0.6):
                e = d * mult
                got = decide_frechet_cfdq(p, q, e, base_query_delta=e, portals=pmap)
                assert got == decide_frechet(p, q, e)

    def test_known_answers_all_deciders(self):
        from frechetrange_spark.kernels.bb_decider import decide_frechet_bb
        from frechetrange_spark.kernels.cfdq import decide_frechet_cfdq

        t1 = np.array([[1.0, 0.0], [2.0, 0.0], [4.0, 0.0], [5.0, 0.0]])
        t2 = np.array([[1.0, 0.0], [3.0, 3.0], [5.0, 0.0]])
        for dec in (decide_frechet_bb, decide_frechet_cfdq):
            assert dec(t1, t2, 3.01) and not dec(t1, t2, 2.99)
        seg = np.array([[0.0, 0.0], [10.0, 0.0]])
        tri = np.array([[0.0, 1.0], [5.0, 10.0], [10.0, 1.0]])
        for dec in (decide_frechet_bb, decide_frechet_cfdq):
            assert dec(seg, tri, 10.01) and not dec(seg, tri, 9.99)


def test_f7_positive_filter_sound():
    """F7 is a YES-prover (after F1): True must imply the decider says
    True (dv/frechet_distance.hpp:100-156)."""
    from frechetrange_spark.kernels import positive_filter

    rng = np.random.default_rng(61)
    fired = 0
    for _ in range(2000):
        p = np.cumsum(rng.normal(size=(rng.integers(2, 30), 2)), axis=0)
        q = np.cumsum(rng.normal(size=(rng.integers(2, 30), 2)), axis=0)
        q += rng.normal(scale=1.0, size=2)
        eps = rng.uniform(0.5, 6.0)
        d0 = p[0] - q[0]
        dn = p[-1] - q[-1]
        if (d0 @ d0) > eps * eps or (dn @ dn) > eps * eps:
            continue  # F7 runs after the endpoint check
        if positive_filter(p, q, eps):
            fired += 1
            assert decide_frechet(p, q, eps)
    assert fired > 50


class TestDecidePairsBuffers:
    """decide_pairs_buffers: the decide core over shared curve tables with
    per-pair (qsel, tsel) indirection — the broadcast-attach refine's
    kernel entry. Must agree with the arrow per-pair wrapper bit-for-bit."""

    def _curve_table(self, curves):
        flat_x = np.concatenate([c[:, 0] for c in curves])
        flat_y = np.concatenate([c[:, 1] for c in curves])
        off = np.concatenate(
            [[0], np.cumsum([len(c) for c in curves])]
        ).astype(np.int64)
        return flat_x, off, flat_y, off

    def test_agrees_with_arrow_wrapper(self):
        import pyarrow as pa

        from frechetrange_spark.kernels.batch import (
            decide_pairs_arrow,
            decide_pairs_buffers,
        )

        rng = np.random.default_rng(17)
        curves = [
            np.cumsum(rng.normal(0, 1, (rng.integers(2, 40), 2)), axis=0)
            for _ in range(40)
        ]
        qi = rng.integers(0, 40, 300).astype(np.int64)
        ti = rng.integers(0, 40, 300).astype(np.int64)
        cols = lambda idx, d: pa.array([curves[i][:, d] for i in idx])
        for flags in (
            dict(),
            dict(greedy_accept=True),
            dict(greedy_accept=True, neg_reject=True),
        ):
            a, sa = decide_pairs_arrow(
                cols(qi, 0), cols(qi, 1), cols(ti, 0), cols(ti, 1),
                5.0, return_stages=True, **flags,
            )
            fx, ox, fy, oy = self._curve_table(curves)
            b, sb = decide_pairs_buffers(
                (fx, ox, fy, oy), (fx, ox, fy, oy), qi, ti,
                5.0, return_stages=True, **flags,
            )
            assert (a == b).all()
            assert (sa == sb).all()

    def test_lookup_miss_raises(self):
        import pytest

        from frechetrange_spark.operators.range_query import _lookup

        ids = np.array([1, 5, 9], dtype=np.int64)
        assert _lookup(ids, np.array([9, 1, 5])).tolist() == [2, 0, 1]
        with pytest.raises(KeyError):
            _lookup(ids, np.array([1, 7]))
        with pytest.raises(KeyError):
            _lookup(np.empty(0, dtype=np.int64), np.array([1]))


class TestUpperBoundAcceptFilters:
    """r06 filter pack additions: reversed-greedy (F4 on the reversed
    pair) and the discrete-Fréchet accept (dfd_leq_batch) are SOUND
    YES-provers — enabling them never changes decide_pairs_arrow's
    result, only which stage decides."""

    def _random_pairs(self, n=400, pts=24, seed=11):
        rng = np.random.default_rng(seed)
        P = np.cumsum(rng.uniform(-1, 1, (n, pts, 2)), axis=1)
        Q = np.cumsum(rng.uniform(-1, 1, (n, pts, 2)), axis=1)
        Q += rng.uniform(-2, 2, (n, 1, 2))
        return P, Q

    def test_dfd_accept_is_sound(self):
        from frechetrange_spark.kernels.batch import (
            decide_frechet_batch,
            dfd_leq_batch,
        )

        P, Q = self._random_pairs()
        for e in (0.5, 1.0, 2.0, 4.0, 8.0):
            acc = dfd_leq_batch(P, Q, np.full(P.shape[0], e * e))
            dec = decide_frechet_batch(P, Q, np.full(P.shape[0], e))
            assert not (acc & ~dec).any(), f"unsound dfd accept at eps={e}"

    def test_dfd_known_answer(self):
        from frechetrange_spark.kernels.batch import dfd_leq_batch

        # GIS-Cup pair: continuous dF = 3; discrete dF = 3 as well
        # (vertex (2,0) pairs with (3,3): sqrt(1+9) > 3? coupling
        # [(1,0)-(1,0),(2,0)-(3,3),(4,0)-(3,3),(5,0)-(5,0)] max = sqrt(10))
        p = T1[None]
        q = T2[None]
        assert dfd_leq_batch(p, q, np.array([10.001]))[0]  # sqrt(10)^2
        assert not dfd_leq_batch(p, q, np.array([9.99]))[0]

    def test_filters_do_not_change_results(self):
        import pyarrow as pa

        from frechetrange_spark.kernels.batch import decide_pairs_arrow

        P, Q = self._random_pairs(n=600, pts=18, seed=5)

        def col(a):
            return pa.array([row.tolist() for row in a], pa.list_(pa.float64()))

        args = (col(P[:, :, 0]), col(P[:, :, 1]), col(Q[:, :, 0]), col(Q[:, :, 1]))
        for e in (1.0, 2.0, 4.0):
            base = decide_pairs_arrow(*args, e, greedy_accept=True)
            fast = decide_pairs_arrow(
                *args, e, greedy_accept=True,
                rev_greedy_accept=True, dfd_accept=True,
            )
            assert (base == fast).all(), f"result drift at eps={e}"
