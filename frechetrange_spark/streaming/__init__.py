"""Structured Streaming: incremental index maintenance (the reference's
post-build insert, dv/grid.hpp:399-407, as a foreachBatch append)."""
