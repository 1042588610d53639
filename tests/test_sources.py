"""Source tests: byte-identical text extraction, deterministic trajectory
reconstruction, and bit-exact parity of the point table with an independent
ANSI-SQL (DuckDB) implementation — the same parity the driver's oracle gate
checks."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from frechetrange_spark.sources.trajectories import (
    assemble_curves,
    points_from_text,
    trajectory_points,
)
from frechetrange_spark.sources.webpages import extracted_pages, webpages
from tests.conftest import SF_SMALL

from frechetrange_spark.oracles import POINTS_SQL as POINTS_ORACLE_SQL


def test_extract_text_byte_identical(spark):
    df = extracted_pages(spark, SF_SMALL).select("text", "text_extracted").toPandas()
    assert len(df) == 500
    mismatches = (df["text"] != df["text_extracted"]).sum()
    assert mismatches == 0
    # bytes, not just str equality
    for t, e in zip(df["text"].head(50), df["text_extracted"].head(50)):
        assert t.encode("utf-8") == e.encode("utf-8")


def test_webpages_schema_and_determinism(spark):
    df = webpages(spark, SF_SMALL)
    assert [f.name for f in df.schema.fields] == [
        "url",
        "warc_ts",
        "html",
        "text",
        "lang",
        "doc_id",
    ]
    a = df.orderBy("doc_id").limit(5).toPandas()
    b = webpages(spark, SF_SMALL).orderBy("doc_id").limit(5).toPandas()
    assert (a["url"] == b["url"]).all()
    assert all(x == y for x, y in zip(a["html"], b["html"]))


def test_point_table_matches_duckdb_oracle_bitexact(spark):
    got = (
        trajectory_points(spark, SF_SMALL)
        .orderBy("traj_id", "seq")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want = con.execute(
        POINTS_ORACLE_SQL + " ORDER BY traj_id, seq"
    ).fetchdf()
    assert len(got) == len(want)
    assert (got["traj_id"].values == want["traj_id"].values).all()
    assert (got["seq"].values == want["seq"].values).all()
    # bit-exact doubles: identical integer math + same-order IEEE sums
    assert np.array_equal(got["x"].values, want["x"].values)
    assert np.array_equal(got["y"].values, want["y"].values)


def test_via_html_path_equals_direct_path(spark):
    direct = trajectory_points(spark, SF_SMALL).orderBy("traj_id", "seq").toPandas()
    via = trajectory_points(spark, SF_SMALL, via_html=True).orderBy(
        "traj_id", "seq"
    ).toPandas()
    assert np.array_equal(direct["x"].values, via["x"].values)
    assert np.array_equal(direct["y"].values, via["y"].values)


def test_assemble_curves(spark):
    pts = trajectory_points(spark, SF_SMALL)
    cur = assemble_curves(pts)
    row = cur.filter("traj_id = 0").collect()[0]
    pdf = pts.filter("traj_id = 0").orderBy("seq").toPandas()
    assert row["n_points"] == len(pdf)
    assert row["xs"] == list(pdf["x"])
    assert row["x_first"] == pdf["x"].iloc[0]
    assert row["x_last"] == pdf["x"].iloc[-1]
    assert row["min_x"] == pdf["x"].min()
    assert row["max_y"] == pdf["y"].max()


def test_drop_consecutive_dups_is_frechet_invariant(spark):
    from frechetrange_spark.kernels import frechet_distance

    pts = trajectory_points(spark, SF_SMALL)
    full = assemble_curves(pts).filter("traj_id < 20").orderBy("traj_id").collect()
    dedup = (
        assemble_curves(pts, drop_consecutive_dups=True)
        .filter("traj_id < 20")
        .orderBy("traj_id")
        .collect()
    )
    any_dropped = False
    for a, b in zip(full, dedup):
        assert b["n_points"] <= a["n_points"]
        any_dropped |= b["n_points"] < a["n_points"]
        ca = np.column_stack([a["xs"], a["ys"]])
        cb = np.column_stack([b["xs"], b["ys"]])
        assert frechet_distance(ca, cb) <= 1e-9
    # the synthetic walk does produce occasional zero steps; if none in this
    # slice the invariance check above still ran


class TestImporters:
    """S3 importers (dataset2ssv.py re-expression): file order, header
    skipping, and the character cumsum integration."""

    def _write(self, tmp_path, name, lines):
        p = tmp_path / name
        p.write_text("\n".join(lines) + "\n")

    def test_sanfrancisco_and_order(self, spark, tmp_path):
        from frechetrange_spark.sources.importers import sanfrancisco_points

        d = tmp_path / "sf"
        d.mkdir()
        self._write(d, "b.plt", ["3.0 4.0 0", "5.0 6.0 0"])
        self._write(d, "a.plt", ["1.0 2.0 0"])
        rows = sorted(
            map(tuple, sanfrancisco_points(spark, str(d)).collect())
        )
        # 'a.plt' sorts first -> traj_id 0
        assert rows == [(0, 0, 1.0, 2.0), (1, 0, 3.0, 4.0), (1, 1, 5.0, 6.0)]

    def test_geolife_header_skip(self, spark, tmp_path):
        from frechetrange_spark.sources.importers import geolife_points

        d = tmp_path / "gl"
        d.mkdir()
        self._write(
            d,
            "t.plt",
            ["h1", "h2", "h3", "h4", "h5", "h6", "39.9,116.3,0", "40.0,116.4,0"],
        )
        rows = sorted(map(tuple, geolife_points(spark, str(d)).collect()))
        assert rows == [(0, 0, 39.9, 116.3), (0, 1, 40.0, 116.4)]

    def test_character_cumsum(self, spark, tmp_path):
        from frechetrange_spark.sources.importers import character_points

        d = tmp_path / "ch"
        d.mkdir()
        self._write(d, "file-1", ["1.0 1.0 0", "1.0 -1.0 0", "2.0 0.5 0"])
        rows = sorted(map(tuple, character_points(spark, str(d)).collect()))
        # np.cumsum semantics (dataset2ssv.py:24)
        assert rows == [(0, 0, 1.0, 1.0), (0, 1, 2.0, 0.0), (0, 2, 4.0, 0.5)]


class TestIndexTable:
    def test_write_read_roundtrip_and_query(self, spark, tmp_path):
        from frechetrange_spark.operators.range_query import (
            build_grid_index,
            range_query_grid,
        )
        from frechetrange_spark.sources.index_table import read_index, write_index
        from frechetrange_spark.sources.trajectories import (
            assemble_curves,
            trajectory_points,
        )
        from pyspark.sql import functions as F

        curves = assemble_curves(
            trajectory_points(spark, "/root/testdata/sf0.001")
        ).persist()
        idx, meta = build_grid_index(curves, 15.0, corner="min_min")
        path = str(tmp_path / "index")
        write_index(idx, path, meta)
        idx2, meta2 = read_index(spark, path)
        # meta round-trips in full (incl. the auto-chosen salt: None on
        # this uniform corpus, and the build-time stats the attach gate
        # and mesh audit read)
        assert meta2 == meta
        assert meta2["mesh"] == 15.0
        assert meta2["corner"] == "min_min"
        assert meta2["salt"] is None
        assert meta2["mesh_auto"] is False
        assert meta2["payload_bytes"] > 0
        assert idx2.count() == curves.count()
        assert sorted(idx2.columns) == sorted(idx.columns)
        q = curves.filter(F.col("traj_id") % 20 == 0)
        got = set(map(tuple, range_query_grid(idx2, q, 15.0, meta2).collect()))
        exp = set(map(tuple, range_query_grid(idx, q, 15.0, meta).collect()))
        assert got == exp


def test_read_ssv_nan_separated(spark, tmp_path):
    """R-package variant: NaN rows delimit trajectories (dv.R tsplit)."""
    from frechetrange_spark.sources.trajectories import read_ssv

    p = tmp_path / "nan.ssv"
    p.write_text(
        "x y id\n1.0 2.0 0\n3.0 4.0 0\nNaN NaN 0\n5.0 6.0 0\n"
    )
    rows = sorted(map(tuple, read_ssv(spark, str(p), nan_separated=True).collect()))
    assert rows == [(0, 0, 1.0, 2.0), (0, 1, 3.0, 4.0), (1, 0, 5.0, 6.0)]


def test_read_ssv_nan_separated_multi_split(spark, tmp_path):
    """The NaN-split prefix count is a DISTRIBUTED two-level scan: force
    the CSV read into many input splits (tiny maxPartitionBytes) and
    assert ids/order equal the single-split read — trajectories spanning
    split boundaries get the right global id."""
    from frechetrange_spark.sources.trajectories import read_ssv

    lines = ["x y id"]
    # 40 trajectories of 25 points, NaN separators between them
    for t in range(40):
        for i in range(25):
            lines.append(f"{t}.{i:02d} {t + i / 100.0} 0")
        if t != 39:
            lines.append("NaN NaN 0")
    p = tmp_path / "nan_big.ssv"
    p.write_text("\n".join(lines) + "\n")

    want = sorted(
        map(tuple, read_ssv(spark, str(p), nan_separated=True).collect())
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        df = read_ssv(spark, str(p), nan_separated=True)
        assert df.rdd.getNumPartitions() >= 1
        got = sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert got == want
    assert len({r[0] for r in got}) == 40
    # no giant single-task window: the only unpartitioned window in the
    # plan runs over the per-split totals, not the point rows
    plan = df._jdf.queryExecution().toString().lower()
    assert "spark_partition_id" in plan and "_split" in plan
