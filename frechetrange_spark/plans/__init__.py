"""Execution plans: snapshot-checkpointed stage runner with per-partition
lineage and metrics."""
