"""frechetrange_spark — a PySpark-native engine for range queries under the
continuous (true) Fréchet distance, re-expressing the capabilities of the
GIS Cup 2017 reference library ``mwernerds/frechetrange``.

Architecture (Spark-first, not a port):

- geometry kernels are vectorized numpy, executed inside Arrow-batched
  pandas UDFs (``applyInPandas`` / ``mapInPandas``) — never per-row Python;
- candidate generation (the reference's spatial indexes) becomes cell-id
  columns + equi-joins that Catalyst can prune, broadcast, and skew-handle;
- cheap filters (endpoint / MBR / farthest-MBR) stay OUTSIDE the UDFs as
  native column predicates so they push below the join;
- the carrier data model is a Common-Crawl-style web-pages table
  ``(url, warc_ts, html, text, lang)`` from which trajectories are
  reconstructed deterministically per url.

Reference parity notes cite ``/root/reference`` file:line in docstrings.
"""

__version__ = "0.1.0"
