"""Bounded-memory single-file `.nc` export
(``write_nc_aggregate_streamed``): byte-identical to the driver-side
path on the same input, ordered under multi-block range partitioning,
and able to export 10M+ rows with the Spark driver capped at 1 GiB —
the scale contract the in-memory path cannot meet (VERDICT r4 #1).
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest
from pyspark.sql import functions as F

from ncagg_spark.sources.nc_granules import (
    _write_nc_aggregate_inmem as write_nc_aggregate,  # pin: in-memory twin
    write_nc_aggregate_streamed,
)
from ncagg_spark.sources.netcdf3 import read_netcdf3


def _mixed_df(spark, n=500):
    rows = []
    for i in range(n):
        ts = datetime.datetime(
            2024, 1, 2, tzinfo=datetime.timezone.utc
        ) + datetime.timedelta(seconds=i)
        rows.append(
            (
                ts,
                float(i) * 0.5,
                i,
                i if i % 5 else None,  # nullable long -> float64 promo
                [float(i), float(i + 1), float(i + 2)],
                f"name{i}" if i % 7 else None,
                i % 2 == 0,
            )
        )
    return spark.createDataFrame(
        rows,
        "ts timestamp, val double, n long, nn long, "
        "arr array<double>, tag string, flag boolean",
    )


def test_streamed_export_byte_identical(spark, tmp_path):
    df = _mixed_df(spark)
    kw = dict(
        index_col="ts",
        attributes={"title": "x", "count": 5},
        var_attributes={"val": {"units": "W"}},
    )
    write_nc_aggregate(df, str(tmp_path / "mem.nc"), **kw)
    write_nc_aggregate_streamed(df, str(tmp_path / "str.nc"), **kw)
    assert (
        (tmp_path / "mem.nc").read_bytes()
        == (tmp_path / "str.nc").read_bytes()
    )


def test_streamed_export_single_record_var_packed(spark, tmp_path):
    df = _mixed_df(spark, 64).select("ts")
    write_nc_aggregate(df, str(tmp_path / "mem.nc"), index_col="ts")
    write_nc_aggregate_streamed(df, str(tmp_path / "str.nc"), index_col="ts")
    assert (
        (tmp_path / "mem.nc").read_bytes()
        == (tmp_path / "str.nc").read_bytes()
    )


def test_streamed_export_many_blocks_ordered(spark, tmp_path):
    """Force multi-block range partitioning (tiny block size) on shuffled
    input: output must still be index-sorted and value-correct."""
    df = _mixed_df(spark, 400).orderBy("val")  # not index order
    out = str(tmp_path / "s.nc")
    write_nc_aggregate_streamed(
        df.select("ts", "val", "n"),
        out,
        index_col="ts",
        target_block_bytes=2048,  # ~85 records/block -> several blocks
    )
    f = read_netcdf3(out)
    assert f.numrecs == 400
    t = f.data["ts"]
    assert np.all(np.diff(t) > 0)
    np.testing.assert_array_equal(f.data["n"], np.arange(400))


def test_streamed_export_int_array_nulls_promote(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, [1, 2]), (1, None), (2, [3, 4])], "rid long, a array<long>"
    )
    out = str(tmp_path / "p.nc")
    write_nc_aggregate_streamed(df, out, index_col="rid")
    f = read_netcdf3(out)
    assert f.data["a"].dtype == np.dtype(">f8")
    assert np.isnan(f.data["a"][1]).all()


@pytest.mark.slow
def test_streamed_export_10m_rows_capped_driver(tmp_path):
    """10M rows (~0.5 GB of record data) exported to ONE classic .nc
    with spark.driver.memory=1g — the in-memory toPandas path cannot
    hold this; the streamed path's driver footprint is one block."""
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession, functions as F
        from ncagg_spark.sources.nc_granules import (
            write_nc_aggregate_streamed,
        )
        spark = (
            # plain local[8], default maxFailures=1, default
            # maxDirectResultSize: the r13 spill-file transport moves
            # encoded blocks through the filesystem, so NOTHING rides
            # task results / the block manager and the r7-r12
            # TaskResultLost flake class cannot occur. Running with no
            # retries is deliberate — the export must be deterministic
            # on one attempt.
            SparkSession.builder.master("local[8]")
            .config("spark.driver.memory", "1g")
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        n = 10_000_000
        df = spark.range(n).select(
            (F.col("id") * 0.1).alias("time"),
            (F.col("id") % 1000).cast("double").alias("v1"),
            F.array(
                (F.col("id") % 7).cast("double"),
                (F.col("id") % 11).cast("double"),
                (F.col("id") % 13).cast("double"),
            ).alias("obs"),
        )
        out = sys.argv[1]
        write_nc_aggregate_streamed(df, out, index_col="time")
        import os
        print("OK", os.path.getsize(out))
        """
    )
    out = str(tmp_path / "big.nc")
    sp = str(tmp_path / "script.py")
    with open(sp, "w") as f:
        f.write(script)
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, sp, out],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "OK" in r.stdout
    # header sanity without materializing data: 10M records, 3 vars
    with open(out, "rb") as f:
        head = f.read(4096)
    assert head[:3] == b"CDF"
    size = os.path.getsize(out)
    # 8 (time) + 8 (v1) + 24 (obs) = 40 B/record + header
    assert size > 10_000_000 * 40


def test_streamed_nc4_value_equal(spark, tmp_path):
    """fmt="netcdf4": the streamed HDF5 export is value-equal to the
    in-memory writer (layout differs only in allocation order)."""
    from ncagg_spark.sources.hdf5 import read_hdf5

    df = _mixed_df(spark)
    kw = dict(
        index_col="ts",
        attributes={"title": "x", "count": 5},
        var_attributes={"val": {"units": "W"}},
    )
    write_nc_aggregate(
        df, str(tmp_path / "m.nc4"), fmt="netcdf4", compression=5, **kw
    )
    write_nc_aggregate_streamed(
        df, str(tmp_path / "s.nc4"), fmt="netcdf4", compression=5, **kw
    )
    a = read_hdf5(str(tmp_path / "m.nc4"))
    b = read_hdf5(str(tmp_path / "s.nc4"))
    assert sorted(a.datasets) == sorted(b.datasets)
    assert a.root_attributes == b.root_attributes
    for name in a.datasets:
        va, vb = a.read(name), b.read(name)
        if va.dtype.kind == "f":
            np.testing.assert_array_equal(
                np.isnan(va), np.isnan(vb)
            )
            np.testing.assert_array_equal(
                va[~np.isnan(va)], vb[~np.isnan(vb)]
            )
        else:
            np.testing.assert_array_equal(va, vb)
        assert (
            a.datasets[name].attributes.get("units")
            == b.datasets[name].attributes.get("units")
        )


def test_streamed_nc4_record_chunksize_and_multichunk(spark, tmp_path):
    from ncagg_spark.sources.hdf5 import read_hdf5

    n = 1000
    df = spark.createDataFrame(
        [(1_704_153_600_000_000 + i * 1_000_000, float(i)) for i in range(n)],
        "us long, v double",
    ).select(F.timestamp_micros("us").alias("ts"), "v")
    p = str(tmp_path / "c.nc4")
    write_nc_aggregate_streamed(
        df, p, fmt="netcdf4", index_col="ts",
        record_chunksize=128, compression=4,
    )
    h5 = read_hdf5(p)
    assert h5.datasets["v"].layout["chunk"] == (128,)
    vals = h5.read("v")
    np.testing.assert_array_equal(vals, np.arange(n, dtype="float64"))
    # edge chunk (1000 % 128 != 0) decoded correctly too
    ts = h5.read("ts")
    assert ts[-1] - ts[0] == pytest.approx(n - 1)


def test_streamed_nc4_capped_driver(tmp_path):
    """2M rows exported to ONE .nc4 with spark.driver.memory=1g: the
    toPandas path would hold the whole aggregate; the streamed path's
    driver footprint is one compressed chunk."""
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession, functions as F
        from ncagg_spark.sources.nc_granules import (
            write_nc_aggregate_streamed,
        )
        spark = (
            # plain local[8], default maxFailures=1, default
            # maxDirectResultSize: the r13 spill-file transport moves
            # compressed chunk payloads through the filesystem, so
            # NOTHING rides task results / the block manager and the
            # r7-r12 TaskResultLost flake class cannot occur. No
            # retries is deliberate — the export must be deterministic
            # on one attempt.
            SparkSession.builder.master("local[8]")
            .config("spark.driver.memory", "1g")
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        n = 2_000_000
        df = spark.range(n).select(
            (F.col("id") * 0.1).alias("time"),
            (F.col("id") % 1000).cast("double").alias("v1"),
            F.array(
                (F.col("id") % 7).cast("double"),
                (F.col("id") % 11).cast("double"),
                (F.col("id") % 13).cast("double"),
            ).alias("obs"),
        )
        out = sys.argv[1]
        write_nc_aggregate_streamed(
            df, out, index_col="time", fmt="netcdf4", compression=1
        )
        import os
        print("OK", os.path.getsize(out))
        """
    )
    out = str(tmp_path / "big.nc4")
    sp = str(tmp_path / "script.py")
    with open(sp, "w") as f:
        f.write(script)
    r = subprocess.run(
        [sys.executable, sp, out],
        capture_output=True,
        text=True,
        timeout=600,
        env=dict(os.environ),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "OK" in r.stdout
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89HDF\r\n\x1a\n"
    # spot-decode the tail records without loading everything twice
    from ncagg_spark.sources.hdf5 import read_hdf5

    h5 = read_hdf5(out)
    v1 = h5.read("v1")
    assert len(v1) == 2_000_000 and v1[-1] == (2_000_000 - 1) % 1000


def test_streamed_nc4_chunksize_exceeding_numrecs_clamped(spark, tmp_path):
    """record_chunksize > numrecs: declared chunk metadata and encoded
    blocks must agree (clamped to numrecs), not diverge by 5x."""
    from ncagg_spark.sources.hdf5 import read_hdf5

    df = spark.createDataFrame(
        [(1_704_153_600_000_000 + i * 1_000_000, float(i)) for i in range(100)],
        "us long, v double",
    ).select(F.timestamp_micros("us").alias("ts"), "v")
    p = str(tmp_path / "ck.nc4")
    write_nc_aggregate_streamed(
        df, p, fmt="netcdf4", index_col="ts", record_chunksize=5000
    )
    h5 = read_hdf5(p)
    assert h5.datasets["v"].layout["chunk"] == (100,)
    np.testing.assert_array_equal(h5.read("v"), np.arange(100.0))


def test_streamed_classic_rejects_nc4_only_flags(spark, tmp_path):
    df = spark.createDataFrame(
        [(1_704_153_600_000_000, 1.0)], "us long, v double"
    ).select(F.timestamp_micros("us").alias("ts"), "v")
    with pytest.raises(ValueError, match="netcdf4"):
        write_nc_aggregate_streamed(
            df, str(tmp_path / "x.nc"), index_col="ts", compression=5
        )


def test_streamed_nc4_wide_array_default_chunk_capped(spark, tmp_path):
    """A wide array variable must cap the DEFAULT chunk per-variable
    (previously the 4096-record floor built multi-GiB chunks)."""
    from ncagg_spark.sources.hdf5 import read_hdf5

    w = 1 << 14  # 16k float64 = 128 KiB per row for this var
    df = spark.createDataFrame(
        [(1_704_153_600_000_000 + i * 1_000_000, float(i)) for i in range(64)],
        "us long, seed double",
    ).select(
        F.timestamp_micros("us").alias("ts"),
        F.expr(f"transform(sequence(1, {w}), j -> seed)").alias("wide"),
    )
    p = str(tmp_path / "wide.nc4")
    write_nc_aggregate_streamed(df, p, fmt="netcdf4", index_col="ts")
    h5 = read_hdf5(p)
    rows, width = h5.datasets["wide"].layout["chunk"]
    assert width == w
    assert rows * w * 8 <= 16 << 20  # per-variable 16 MiB cap
    assert h5.read("wide").shape == (64, w)


def test_nested_array_columns_export_3d(spark, tmp_path):
    """array<array<T>> columns (2-D per record, e.g. MAG's
    (report, samples, 3) field vectors) export as 3-D
    (record, dim1, dim2) variables — round 6, found by exporting the
    full real MAG aggregate in the head-to-head harness. Both export
    paths must agree byte-for-byte; ragged rows pad NaN; int64 only
    when every row and element is full."""
    import numpy as np
    from pyspark.sql import functions as F

    from ncagg_spark.sources.nc_granules import (
        write_nc_aggregate,
        write_nc_aggregate_streamed,
    )
    from ncagg_spark.sources.netcdf3 import read_netcdf3

    T0 = 1_704_153_600_000_000
    rows = []
    for i in range(50):
        mat = [[float(i), float(j), i + j / 10.0] for j in range(4)]
        if i == 7:
            mat = mat[:2]  # ragged outer -> float64 + NaN pad
        imat = [[i, j] for j in range(3)]  # full -> int64
        rows.append((T0 + i * 1_000_000, mat, imat, float(i)))
    df = spark.createDataFrame(
        rows,
        "us long, field array<array<double>>, "
        "counts array<array<long>>, v double",
    ).select(
        F.timestamp_micros("us").alias("ts"), "field", "counts", "v"
    )

    p_mem = str(tmp_path / "mem.nc")
    p_str = str(tmp_path / "str.nc")
    write_nc_aggregate(df, p_mem, index_col="ts")
    write_nc_aggregate_streamed(df, p_str, index_col="ts")
    a = open(p_mem, "rb").read()
    assert a == open(p_str, "rb").read()

    f = read_netcdf3(a)
    field = f.data["field"]
    counts = f.data["counts"]
    assert field.shape == (50, 4, 3) and field.dtype.kind == "f"
    # classic files store big-endian; int64 fullness rule held
    assert counts.shape == (50, 3, 2)
    assert counts.dtype.kind == "i" and counts.dtype.itemsize == 8
    assert field[3][2][2] == 3 + 2 / 10.0
    # ragged row 7: rows 2..3 padded NaN
    assert np.isnan(field[7][3]).all() and np.isfinite(field[7][1]).all()
    assert counts[49][2][1] == 2
    assert f.variables["field"].dims == ["ts", "field_dim1", "field_dim2"]


def test_nested_array_deeper_nesting_raises(spark, tmp_path):
    from pyspark.sql import functions as F

    from ncagg_spark.sources.nc_granules import (
        write_nc_aggregate_streamed,
    )

    df = spark.createDataFrame(
        [(1_704_153_600_000_000, [[[1.0]]])],
        "us long, x array<array<array<double>>>",
    ).select(F.timestamp_micros("us").alias("ts"), "x")
    with pytest.raises(ValueError, match="deeper than 2"):
        write_nc_aggregate_streamed(
            df, str(tmp_path / "n.nc"), index_col="ts"
        )


def test_nested_array_nc4_streamed_value_equal_to_inmem(spark, tmp_path):
    """Streamed netCDF-4 export of nested (2-D per record) array
    columns (r7 — closed the r6 NotImplementedError): value-equal to
    the in-memory nc4 writer, including ragged rows padded NaN and the
    3-D dims."""
    import datetime

    from pyspark.sql import functions as F

    from ncagg_spark.sources.hdf5 import read_hdf5
    from ncagg_spark.sources.nc_granules import (
        write_nc_aggregate_streamed,
    )

    t0 = 1_704_153_600_000_000
    rows = [
        (t0, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]),
        (t0 + 1_000_000, [[7.0, 8.0]]),  # ragged -> NaN padding
        (t0 + 2_000_000, [[9.0, 10.0, 11.0], [12.0, 13.0, 14.0]]),
    ]
    df = spark.createDataFrame(
        rows, "us long, m array<array<double>>"
    ).select(F.timestamp_micros("us").alias("ts"), "m")
    p_str = str(tmp_path / "s.nc4")
    p_mem = str(tmp_path / "m.nc4")
    write_nc_aggregate_streamed(
        df, p_str, fmt="netcdf4", index_col="ts", compression=4
    )
    write_nc_aggregate(
        df, p_mem, fmt="netcdf4", index_col="ts", compression=4
    )
    hs = read_hdf5(open(p_str, "rb").read())
    hm = read_hdf5(open(p_mem, "rb").read())
    a, b = hs.read("m"), hm.read("m")
    assert a.shape == b.shape == (3, 2, 3)
    np.testing.assert_array_equal(
        np.isnan(a), np.isnan(b)
    )
    np.testing.assert_array_equal(a[~np.isnan(a)], b[~np.isnan(b)])
    assert a[1, 0, :2].tolist() == [7.0, 8.0]
    assert np.isnan(a[1, 0, 2]) and np.isnan(a[1, 1]).all()


def test_streamed_export_explicit_spill_dir(spark, tmp_path):
    """ADVICE r13: the big-path spill directory is executor-written —
    an explicit ``spill_dir=`` (for clusters where the output path is
    driver-local) must be honored, used for the spill files, and the
    user's base dir must survive the export (only the mkdtemp child is
    cleaned up). Byte-identity with the default-sibling run pins that
    the transport location does not affect the output."""
    df = _mixed_df(spark, 400)
    base = tmp_path / "shared-scratch"
    out_a = str(tmp_path / "a.nc")
    out_b = str(tmp_path / "b.nc")
    kw = dict(index_col="ts", target_block_bytes=2048)  # force big path
    write_nc_aggregate_streamed(df, out_a, **kw)
    write_nc_aggregate_streamed(df, out_b, spill_dir=str(base), **kw)
    assert (tmp_path / "a.nc").read_bytes() == (tmp_path / "b.nc").read_bytes()
    # the base dir was created, used, and left in place (empty again)
    assert base.is_dir()
    assert list(base.iterdir()) == []


def test_streamed_export_spill_dir_conf_nc4(spark, tmp_path):
    """The ``spark.ncagg.spillDir`` conf routes the netCDF-4 spill files
    too, and the splice is value-equal to a default-sibling run."""
    from ncagg_spark.sources.hdf5 import read_hdf5

    df = _mixed_df(spark, 300).select("ts", "val", "n")
    base = tmp_path / "conf-scratch"
    out_a = str(tmp_path / "a4.nc")
    out_b = str(tmp_path / "b4.nc")
    kw = dict(index_col="ts", fmt="netcdf4", record_chunksize=64)
    write_nc_aggregate_streamed(df, out_a, **kw)
    spark.conf.set("spark.ncagg.spillDir", str(base))
    try:
        write_nc_aggregate_streamed(df, out_b, **kw)
    finally:
        spark.conf.unset("spark.ncagg.spillDir")
    fa = read_hdf5(open(out_a, "rb").read())
    fb = read_hdf5(open(out_b, "rb").read())
    assert set(fa.datasets) == set(fb.datasets)
    for k in fa.datasets:
        np.testing.assert_array_equal(fa.read(k), fb.read(k))
    assert base.is_dir() and list(base.iterdir()) == []
