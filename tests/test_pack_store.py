"""Co-partitioned curve-pack store (sources/pack_store): the attach arm
for curve tables past the broadcast threshold. Parity-gated against both
existing arms — all three must return identical result sets."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frechetrange_spark.operators.range_query import (
    _pack_curves,
    build_grid_index,
    range_query_grid,
)
from frechetrange_spark.operators.simplifications import (
    enrich_with_simplifications,
)
from frechetrange_spark.sources.pack_store import gather_pack, write_pack
from frechetrange_spark.sources.trajectories import (
    assemble_curves,
    trajectory_points,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def enriched(spark):
    c = enrich_with_simplifications(
        assemble_curves(trajectory_points(spark, SF_SMALL)),
        levels=2,
        fractions=(0.07, 0.6),
    ).persist()
    c.count()
    return c


def test_write_gather_roundtrip(spark, enriched, tmp_path):
    """gather_pack over the on-disk blocks reproduces the driver-side
    broadcast pack (_pack_curves) buffer-for-buffer, for the full id set
    and for scattered subsets crossing block boundaries."""
    path = str(tmp_path / "pack")
    man = write_pack(enriched, path, n_blocks=7)
    assert len(man["blocks"]) >= 1
    ref = _pack_curves(enriched, 2)
    for ids in (ref["ids"], ref["ids"][::5], ref["ids"][-3:]):
        got = gather_pack(path, np.asarray(ids), 2)
        assert np.array_equal(got["ids"], ids)
        sel = np.searchsorted(ref["ids"], ids)
        for c, (flat, off) in got["cols"].items():
            rflat, roff = ref["cols"][c]
            for k, r in enumerate(sel):
                np.testing.assert_array_equal(
                    flat[off[k] : off[k + 1]], rflat[roff[r] : roff[r + 1]]
                )
        for c, vals in got["scal"].items():
            np.testing.assert_array_equal(vals, ref["scal"][c][sel])


def test_missing_ids_raise(spark, enriched, tmp_path):
    path = str(tmp_path / "pack")
    write_pack(enriched, path, n_blocks=3)
    with pytest.raises(KeyError):
        gather_pack(path, np.asarray([10**12], dtype=np.int64), 0)
    # empty request is fine (degenerate candidate batch)
    empty = gather_pack(path, np.empty(0, dtype=np.int64), 2)
    assert empty["ids"].size == 0


def test_pack_attach_parity(spark, enriched, tmp_path):
    """attach='pack' == 'broadcast' == 'shuffle' result sets, with the
    funnel columns riding and with the query side broadcast-packed."""
    from frechetrange_spark.sources.index_table import read_index, write_index

    index_df, meta = build_grid_index(enriched, 15.0, corner="min_min")
    path = str(tmp_path / "idx")
    write_index(index_df, path, meta, pack=True)
    idx, meta2 = read_index(spark, path)
    assert meta2.get("pack_path")
    queries = idx.filter(F.col("traj_id") % 20 == 0)
    res = {
        a: set(
            map(
                tuple,
                range_query_grid(idx, queries, 15.0, meta2, attach=a).collect(),
            )
        )
        for a in ("shuffle", "broadcast", "pack")
    }
    assert res["pack"] == res["shuffle"] == res["broadcast"]
    assert len(res["pack"]) > 0


def test_pack_self_join_disk_query_side(spark, enriched, tmp_path):
    """Symmetric self-join with the broadcast threshold forced to 0-ish:
    the query side cannot broadcast and falls back to the SAME disk
    store; results still match the shuffle arm, and attach='auto' routes
    to the pack arm (meta carries pack_path + over-threshold payload)."""
    from frechetrange_spark.sources.index_table import read_index, write_index

    index_df, meta = build_grid_index(enriched, 15.0, corner="min_min")
    path = str(tmp_path / "idx")
    write_index(index_df, path, meta, pack=True)
    idx, meta2 = read_index(spark, path)
    want = set(
        map(
            tuple,
            range_query_grid(
                idx, idx, 15.0, meta2, symmetric=True, attach="shuffle"
            ).collect(),
        )
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1k")
        got = set(
            map(
                tuple,
                range_query_grid(
                    idx, idx, 15.0, meta2, symmetric=True, attach="pack"
                ).collect(),
            )
        )
        assert got == want
        auto = set(
            map(
                tuple,
                range_query_grid(
                    idx, idx, 15.0, meta2, symmetric=True, attach="auto"
                ).collect(),
            )
        )
        assert auto == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pack_foreign_over_threshold_query_raises(spark, enriched, tmp_path):
    """r06 (advice item): an over-broadcast-threshold query table that is
    NOT the indexed table itself (symmetric=False, no query_pack_path)
    must fail loudly instead of silently gathering the index's curves
    for the query side — id-overlapping foreign data would otherwise
    return wrong results without any error."""
    from frechetrange_spark.sources.index_table import read_index, write_index

    index_df, meta = build_grid_index(enriched, 15.0, corner="min_min")
    path = str(tmp_path / "idx")
    write_index(index_df, path, meta, pack=True)
    idx, meta2 = read_index(spark, path)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1k")
        with pytest.raises(ValueError, match="query table"):
            range_query_grid(idx, idx, 15.0, meta2, attach="pack")
        # and an explicit query_pack_path pointing at the (correct) store
        # restores the old behaviour for the genuinely-same-table case
        meta3 = dict(meta2, query_pack_path=meta2["pack_path"])
        got = set(
            map(
                tuple,
                range_query_grid(idx, idx, 15.0, meta3, attach="pack").collect(),
            )
        )
        want = set(
            map(
                tuple,
                range_query_grid(
                    idx, idx, 15.0, meta2, attach="shuffle"
                ).collect(),
            )
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
