"""The engine's scalar UDF surface — the Spark counterpart of the
reference's Python binding (python-package/frechet.cpp:406-432 registers
``FrechetDecider.decide/decide_dv/decide_bb``; index classes expose
add/build/query). Per the input hint, everything is a vectorized
pandas/Arrow UDF — no per-row Python registered anywhere.

Curves are passed as paired array<double> columns (xs, ys), the engine's
native layout. ``register_all(spark)`` makes every function callable from
SQL, e.g.::

    SELECT frechet_decide(a.xs, a.ys, b.xs, b.ys, 15.0) FROM ...
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BooleanType, DoubleType, LongType


def _pairs(xs1, ys1, xs2, ys2):
    ps = [np.column_stack([np.asarray(a), np.asarray(b)]) for a, b in zip(xs1, ys1)]
    ts = [np.column_stack([np.asarray(a), np.asarray(b)]) for a, b in zip(xs2, ys2)]
    return ps, ts


@pandas_udf(BooleanType())
def frechet_decide(
    xs1: pd.Series, ys1: pd.Series, xs2: pd.Series, ys2: pd.Series, eps: pd.Series
) -> pd.Series:
    """True iff continuous Fréchet distance <= eps (exact decision, K5).
    Reference: FrechetDecider.decide, python-package/frechet.cpp:86-111."""
    from frechetrange_spark.kernels.batch import decide_frechet_pairs

    ps, ts = _pairs(xs1, ys1, xs2, ys2)
    return pd.Series(decide_frechet_pairs(ps, ts, eps.to_numpy(dtype=np.float64)))


@pandas_udf(DoubleType())
def frechet_dist(
    xs1: pd.Series, ys1: pd.Series, xs2: pd.Series, ys2: pd.Series
) -> pd.Series:
    """Fréchet distance value via batched bisection over the decider (K12,
    samples/plain.cpp:47-60)."""
    from frechetrange_spark.kernels.batch import frechet_distance_pairs

    ps, ts = _pairs(xs1, ys1, xs2, ys2)
    return pd.Series(frechet_distance_pairs(ps, ts))


@pandas_udf(DoubleType())
def frechet_etd(
    xs1: pd.Series, ys1: pd.Series, xs2: pd.Series, ys2: pd.Series
) -> pd.Series:
    """Equal-time distance — upper bound on the Fréchet distance (F8,
    detail/bddm/spatial_hash.hpp:253-362)."""
    from frechetrange_spark.kernels.batch import etd_batch, pad_curves

    ps, ts = _pairs(xs1, ys1, xs2, ys2)
    if not ps:
        return pd.Series(np.empty(0, dtype=np.float64))
    p, _ = pad_curves(ps)
    t, _ = pad_curves(ts)
    return pd.Series(etd_batch(p, t))


@pandas_udf(DoubleType())
def frechet_greedy_ub(
    xs1: pd.Series, ys1: pd.Series, xs2: pd.Series, ys2: pd.Series
) -> pd.Series:
    """Greedy monotone-alignment upper bound (F4,
    detail/bb/spatial_index.hpp:251-278)."""
    from frechetrange_spark.kernels.core import greedy_upper_bound

    ps, ts = _pairs(xs1, ys1, xs2, ys2)
    return pd.Series([greedy_upper_bound(p, t) for p, t in zip(ps, ts)])


@pandas_udf(ArrayType(LongType()))
def agarwal_simplify(xs: pd.Series, ys: pd.Series, eps: pd.Series) -> pd.Series:
    """Vertex indices of the Agarwal simplification at eps (K8,
    detail/bddm/spatial_hash.hpp:1193-1257); frechet(curve[idx], curve) <= eps."""
    from frechetrange_spark.kernels.simplify import agarwal_indices

    out = []
    for a, b, e in zip(xs, ys, eps):
        c = np.column_stack([np.asarray(a), np.asarray(b)])
        out.append(agarwal_indices(c, float(e)).tolist())
    return pd.Series(out)


def register_all(spark) -> None:
    """Register the full UDF surface for SQL use."""
    spark.udf.register("frechet_decide", frechet_decide)
    spark.udf.register("frechet_dist", frechet_dist)
    spark.udf.register("frechet_etd", frechet_etd)
    spark.udf.register("frechet_greedy_ub", frechet_greedy_ub)
    spark.udf.register("agarwal_simplify", agarwal_simplify)
