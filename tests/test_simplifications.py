"""Agarwal simplification (K8/K10) and the query-time funnel (F9).

The load-bearing property is the certificate: frechet(simplified, original)
<= stored eps — the funnel's YES/NO shortcuts are exact only under it.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frechetrange_spark.kernels.core import frechet_distance
from frechetrange_spark.kernels.simplify import (
    _prefix_arc,
    _segment_etd,
    agarwal_indices,
    simplification_levels,
)


class TestAgarwalKernel:
    def test_certificate_property(self):
        rng = np.random.default_rng(21)
        for _ in range(8):
            c = np.cumsum(rng.normal(size=(rng.integers(5, 120), 2)), axis=0)
            diag = np.hypot(np.ptp(c[:, 0]), np.ptp(c[:, 1])) or 1.0
            for idx, eps in simplification_levels(c, diag, levels=2, fractions=(0.07, 0.6)):
                simp = c[idx]
                assert idx[0] == 0 and idx[-1] == len(c) - 1
                assert (np.diff(idx) > 0).all()
                # the certificate the funnel depends on
                assert frechet_distance(c, simp) <= eps + 1e-9

    def test_segment_etd_property(self):
        rng = np.random.default_rng(22)
        c = np.cumsum(rng.normal(size=(60, 2)), axis=0)
        tp = _prefix_arc(c)
        idx = agarwal_indices(c, 1.5)
        for a, b in zip(idx[:-1], idx[1:]):
            assert _segment_etd(c, tp, int(a), int(b)) <= 1.5 + 1e-12

    def test_tiny_curves(self):
        one = np.array([[1.0, 2.0]])
        two = np.array([[0.0, 0.0], [3.0, 4.0]])
        assert list(agarwal_indices(one, 0.5)) == [0]
        assert list(agarwal_indices(two, 0.5)) == [0, 1]
        for idx, eps in simplification_levels(two, 5.0, levels=2, fractions=(0.07, 0.6)):
            assert list(idx) == [0, 1]

    def test_monotone_in_eps(self):
        rng = np.random.default_rng(23)
        c = np.cumsum(rng.normal(size=(80, 2)), axis=0)
        sizes = [len(agarwal_indices(c, e)) for e in (0.1, 0.5, 2.0, 8.0)]
        assert sizes == sorted(sizes, reverse=True)


@pytest.mark.usefixtures("spark")
class TestFunnelEndToEnd:
    def test_funnel_matches_bruteforce(self, spark):
        from frechetrange_spark.operators.range_query import (
            build_grid_index,
            range_query_bruteforce,
            range_query_grid,
        )
        from frechetrange_spark.operators.simplifications import (
            enrich_with_simplifications,
        )
        from frechetrange_spark.sources.trajectories import (
            assemble_curves,
            trajectory_points,
        )

        sf = "/root/testdata/sf0.001"
        raw = assemble_curves(trajectory_points(spark, sf)).persist()
        cur = enrich_with_simplifications(
            raw, levels=2, fractions=(0.07, 0.6)
        ).persist()
        idx, meta = build_grid_index(cur, 15.0, corner="min_min")
        queries = cur.filter(F.col("traj_id") % 10 == 0)
        got = set(
            map(tuple, range_query_grid(idx, queries, 15.0, meta).collect())
        )
        exp = set(
            map(
                tuple,
                range_query_bruteforce(
                    raw, raw.filter(F.col("traj_id") % 10 == 0), 15.0
                ).collect(),
            )
        )
        assert got == exp

    def test_enrichment_columns(self, spark):
        from frechetrange_spark.operators.simplifications import (
            enrich_with_simplifications,
            simp_cols,
        )
        from frechetrange_spark.sources.trajectories import (
            assemble_curves,
            trajectory_points,
        )

        cur = enrich_with_simplifications(
            assemble_curves(trajectory_points(spark, "/root/testdata/sf0.001")),
            levels=2,
            fractions=(0.07, 0.6),
        )
        for c in simp_cols(2):
            assert c in cur.columns
        row = cur.select("n_points", "s0_xs", "s0_eps", "s1_xs").first()
        assert 0 < len(row["s0_xs"]) <= row["n_points"]
        assert row["s0_eps"] > 0
        assert len(row["s1_xs"]) >= len(row["s0_xs"])


@pytest.mark.usefixtures("spark")
class TestExternalQueryEnrichment:
    def test_ratio_enriched_queries_give_exact_results(self, spark):
        """A6 path: external queries simplified with dataset-averaged eps
        ratios still produce EXACT range-query results (the certificate is
        the eps actually used, so pruning power may differ, results not)."""
        from frechetrange_spark.operators.range_query import (
            build_grid_index,
            range_query_bruteforce,
            range_query_grid,
        )
        from frechetrange_spark.operators.simplifications import (
            avg_eps_ratios,
            dataset_diagonal,
            enrich_queries_with_ratios,
            enrich_with_simplifications,
        )
        from frechetrange_spark.sources.trajectories import (
            assemble_curves,
            trajectory_points,
        )

        sf = "/root/testdata/sf0.001"
        raw = assemble_curves(trajectory_points(spark, sf)).persist()
        diag = dataset_diagonal(raw)
        enriched = enrich_with_simplifications(
            raw, diagonal=diag, levels=2, fractions=(0.07, 0.6)
        ).persist()
        ratios = avg_eps_ratios(enriched, 2, diag)
        assert all(r > 0 for r in ratios)
        # "external" queries: re-derived from raw curves, enriched via ratios
        ext_queries = enrich_queries_with_ratios(
            raw.filter(F.col("traj_id") % 25 == 0), ratios, diag
        )
        idx, meta = build_grid_index(enriched, 15.0, corner="min_min")
        got = set(
            map(tuple, range_query_grid(idx, ext_queries, 15.0, meta).collect())
        )
        exp = set(
            map(
                tuple,
                range_query_bruteforce(
                    raw, raw.filter(F.col("traj_id") % 25 == 0), 15.0
                ).collect(),
            )
        )
        assert got == exp
