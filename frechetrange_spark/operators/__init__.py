"""Relational + spatial operators: candidate-generation joins, filter
funnels, kernel refinement, tiling, kNN, point-in-polygon, raster<->vector,
and the web-text pipeline operators (dedup, similarity, text analysis)."""
