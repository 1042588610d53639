from frechetrange_spark.functions.udfs import (  # noqa: F401
    agarwal_simplify,
    frechet_decide,
    frechet_dist,
    frechet_etd,
    frechet_greedy_ub,
    register_all,
)
