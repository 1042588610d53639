"""Iceberg-style snapshot checkpoints on parquet (no Iceberg jars in this
environment — the layout keeps the same guarantees: immutable snapshot
directories, a manifest with schema + metrics + content key, and
idempotent resume).

Every pipeline stage writes

    <root>/<stage>/data/            parquet snapshot
    <root>/<stage>/_manifest.json   {key, schema, n_rows, partition_rows,
                                     params, parent_keys, wall_secs}

``run_stage`` skips the build when a manifest with the same content key
already exists (key = sha256 of stage name + params + parent keys), so a
re-run of a partially-finished pipeline resumes from the last completed
snapshot. ``partition_rows`` is the per-partition lineage record
(snapshot file -> row count, one entry per writer partition) required by
the north rule; it is computed from the written snapshot with a
zero-column scan, not by re-running the stage plan.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _content_key(stage: str, params: dict, parent_keys: list[str]) -> str:
    blob = json.dumps(
        {"stage": stage, "params": params, "parents": sorted(parent_keys)},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._keys: dict[str, str] = {}
        os.makedirs(root, exist_ok=True)

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.root, stage)
        return os.path.join(d, "data"), os.path.join(d, "_manifest.json")

    def manifest(self, stage: str) -> dict | None:
        _, mpath = self._paths(stage)
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            return json.load(f)

    def run_stage(
        self,
        stage: str,
        build_fn,
        params: dict | None = None,
        parents: list[str] | None = None,
        force: bool = False,
        metrics_fn=None,
    ) -> DataFrame:
        """Build-or-resume one stage. ``build_fn(spark) -> DataFrame``.

        ``metrics_fn() -> dict`` (optional) is called after the snapshot
        write and its result is stored under ``metrics`` in the manifest —
        use it to surface accumulator-backed Observation counts collected
        during the write (zero extra passes)."""
        params = params or {}
        parent_keys = [self._keys[p] for p in (parents or []) if p in self._keys]
        key = _content_key(stage, params, parent_keys)
        data_path, mpath = self._paths(stage)
        man = self.manifest(stage)
        if man is not None and man.get("key") == key and not force:
            self._keys[stage] = key
            return self.spark.read.parquet(data_path)

        t0 = time.time()
        df = build_fn(self.spark)
        df.write.mode("overwrite").parquet(data_path)
        out = self.spark.read.parquet(data_path)
        # Lineage: per-snapshot-file row counts, computed from the WRITTEN
        # snapshot (one zero-column scan of the parquet we just produced),
        # never by re-running build_fn's plan — the previous pid-groupBy
        # computed the whole upstream twice, which at 100 TB doubles the
        # stage cost. File names are the immutable lineage unit here (an
        # output file == one writer partition), so the record also survives
        # a reader-side coalesce.
        part_rows = {
            os.path.basename(r["f"]): r["n"]
            for r in out.groupBy(F.input_file_name().alias("f"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        manifest = {
            "key": key,
            "metrics": metrics_fn() if metrics_fn is not None else {},
            "stage": stage,
            "params": {k: str(v) for k, v in params.items()},
            "parent_keys": parent_keys,
            "schema": out.schema.jsonValue(),
            "n_rows": sum(part_rows.values()),
            "partition_rows": part_rows,
            "wall_secs": round(time.time() - t0, 3),
        }
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, mpath)  # atomic publish: snapshot is live
        self._keys[stage] = key
        return out
