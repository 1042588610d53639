"""Vectorized numpy geometry kernels.

These are the engine's only non-relational computations. They run inside
Arrow-batched pandas UDFs (``applyInPandas``/``mapInPandas``); nothing in
this package imports pyspark, so the kernels are unit-testable without a
JVM and reusable from any executor.
"""

from frechetrange_spark.kernels.core import (  # noqa: F401
    decide_frechet,
    equal_time_distance,
    frechet_distance,
    free_intervals_point_vs_segments,
    free_intervals_segment_vs_points,
    greedy_upper_bound,
    match_inner_points_monotonously,
    negfilter,
    positive_filter,
)
