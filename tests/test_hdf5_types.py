"""Extended HDF5 datatype/filter surface: enum (class 8), compound
(class 6, incl. member subarrays), and the fletcher32 checksum filter
with verify-on-read — the from-spec reader/writer pair round-trips each,
and a flipped stored byte is detected (not silently decoded).

The reference inherits these from libnetcdf (it does no file parsing of
its own); enums are the one type it documents as unsupported
(README.md:387-388), so decoding them here is a superset.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ncagg_spark.sources.hdf5 import Hdf5Error, fletcher32, read_hdf5
from ncagg_spark.sources.hdf5_writer import write_hdf5


def _ref_fletcher(data: bytes) -> int:
    """Scalar transliteration of the HDF5 Fletcher-32 algorithm
    (big-endian 16-bit words, fold-based mod-65535 reduction)."""
    s1 = s2 = 0
    for i in range(0, len(data) - len(data) % 2, 2):
        s1 += (data[i] << 8) | data[i + 1]
        s2 += s1
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    if len(data) % 2:
        s1 += data[-1] << 8
        s2 += s1
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    s1 = (s1 & 0xFFFF) + (s1 >> 16)
    s2 = (s2 & 0xFFFF) + (s2 >> 16)
    return (s2 << 16) | s1


@pytest.mark.parametrize("n", [0, 1, 2, 3, 7, 100, 4096, 70000])
def test_fletcher32_matches_reference_algorithm(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert fletcher32(data) == _ref_fletcher(data)


def test_fletcher32_nonzero_multiple_of_65535_class():
    # all-0xff words sum into the 0xffff residue class; HDF5's fold
    # represents it as 0xffff, not 0 — the distinction a plain modulo
    # misses
    for n in [2, 4, 6, 65534]:
        data = b"\xff" * n
        assert fletcher32(data) == _ref_fletcher(data)
    assert fletcher32(b"\x00" * 8) == 0


def _enum_blob(**kw):
    flags = np.array([0, 1, 2, 1, 0, 2, 2, 1], dtype=np.int8)
    return flags, write_hdf5(
        None,
        dims=[("time", 0)],
        variables={
            "time": (["time"], np.arange(8, dtype="float64")),
            "flag": (["time"], flags),
        },
        enums={"flag": {"ok": 0, "warn": 1, "bad": 2}},
        **kw,
    )


def test_enum_roundtrip_values_and_name_map():
    flags, blob = _enum_blob()
    h5 = read_hdf5(blob)
    np.testing.assert_array_equal(h5.read("flag"), flags)
    assert h5.datasets["flag"].attributes["_enum_dict"] == {
        "ok": 0,
        "warn": 1,
        "bad": 2,
    }
    assert h5.datasets["flag"].datatype.cls == 8


def test_enum_roundtrip_compressed():
    flags, blob = _enum_blob(compression=6)
    h5 = read_hdf5(blob)
    np.testing.assert_array_equal(h5.read("flag"), flags)


def test_compound_roundtrip_with_member_subarray():
    rng = np.random.default_rng(7)
    comp = np.zeros(
        12,
        dtype=np.dtype(
            [("a", "<i4"), ("b", "<f8"), ("v", "<i2", (3,))]
        ),
    )
    comp["a"] = np.arange(12)
    comp["b"] = np.linspace(-1.0, 1.0, 12)
    comp["v"] = rng.integers(-50, 50, (12, 3))
    blob = write_hdf5(
        None,
        dims=[("time", 0)],
        variables={
            "time": (["time"], np.arange(12, dtype="float64")),
            "rec": (["time"], comp),
        },
        compression=5,
    )
    h5 = read_hdf5(blob)
    out = h5.read("rec")
    assert out.dtype.names == ("a", "b", "v")
    for f in ("a", "b", "v"):
        np.testing.assert_array_equal(out[f], comp[f])


def test_fletcher32_roundtrip_and_corruption_detected():
    data = np.arange(64, dtype="int64")
    blob = write_hdf5(
        None,
        dims=[("time", 0)],
        variables={"time": (["time"], np.arange(64, dtype="float64")),
                   "v": (["time"], data)},
        compression=4,
        fletcher32=True,
    )
    h5 = read_hdf5(blob)
    np.testing.assert_array_equal(h5.read("v"), data)

    # locate v's stored chunk bytes via the reader's own chunk index and
    # flip one byte inside them: the checksum must catch it
    ds = h5.datasets["v"]
    recs = h5._chunk_records(ds.layout["btree"], len(ds.layout["chunk"]) + 1)
    _, addr, size, _ = recs[0]
    corrupted = bytearray(blob)
    corrupted[addr + size // 2] ^= 0xFF
    h5bad = read_hdf5(bytes(corrupted))
    with pytest.raises(Hdf5Error, match="fletcher32"):
        h5bad.read("v")


def test_fletcher32_uncompressed_pipeline():
    # checksum filter alone (no deflate): chunked storage, raw + 4 bytes
    data = np.arange(10, dtype="float32")
    blob = write_hdf5(
        None,
        dims=[("time", 0)],
        variables={"time": (["time"], np.arange(10, dtype="float64")),
                   "v": (["time"], data)},
        fletcher32=True,
    )
    h5 = read_hdf5(blob)
    assert h5.datasets["v"].filters == [(3, [])]
    np.testing.assert_array_equal(h5.read("v"), data)


def test_compound_attribute_decoding_not_required_for_data_vars():
    # plain file still reads fine with the extended parser in place
    blob = write_hdf5(
        None,
        dims=[("time", 0)],
        variables={"time": (["time"], np.arange(4, dtype="float64"))},
        attributes={"title": "plain"},
    )
    h5 = read_hdf5(blob)
    assert h5.root_attributes["title"] == "plain"


def test_fletcher32_written_bytes_inspectable_without_reader():
    """Reader-independent check of the WRITTEN checksum: the stored
    chunk's trailing 4 LE bytes must equal fletcher32 over the preceding
    payload, recomputed here straight from the file bytes (the reader is
    used only to locate the chunk, never to validate it)."""
    import struct

    data = np.arange(32, dtype="int64")
    blob = write_hdf5(
        None,
        dims=[("time", 0)],
        variables={"time": (["time"], np.arange(32, dtype="float64")),
                   "v": (["time"], data)},
        fletcher32=True,  # checksum alone: stored chunk = raw + 4
    )
    h5 = read_hdf5(blob)
    ds = h5.datasets["v"]
    recs = h5._chunk_records(ds.layout["btree"], len(ds.layout["chunk"]) + 1)
    for _, addr, size, _ in recs:
        stored = blob[addr : addr + size]
        payload, trailer = stored[:-4], stored[-4:]
        assert trailer == struct.pack("<I", fletcher32(payload))
        # and the payload really is the little-endian int64 data
        assert payload == data.tobytes()


def test_enum_reexport_through_nc4_aggregate_paths(spark, tmp_path):
    """VERDICT r6 #6 — writer/reader round-trip parity: a variable whose
    var-attributes carry ``_enum_dict`` (what the reader surfaces for a
    class-8 enum) re-exports as a REAL HDF5 enum datatype through BOTH
    nc4 aggregate writers, and the refshim netCDF4 Dataset reads the
    result (values + name map)."""
    import sys

    from ncagg_spark.sources.nc_granules import (
        _write_nc_aggregate_inmem,
        write_nc_aggregate_streamed,
    )
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2), (3, 1)], "rid long, flag long"
    ).selectExpr("rid", "CAST(flag AS TINYINT) AS flag")
    emap = {"ok": 0, "warn": 1, "bad": 2}
    kw = dict(
        index_col="rid",
        fmt="netcdf4",
        var_attributes={"flag": {"_enum_dict": emap, "note": "kept"}},
    )
    p_mem = str(tmp_path / "m.nc4")
    p_str = str(tmp_path / "s.nc4")
    _write_nc_aggregate_inmem(df, p_mem, **kw)
    write_nc_aggregate_streamed(df, p_str, **kw)
    for p in (p_mem, p_str):
        h5 = read_hdf5(open(p, "rb").read())
        ds = h5.datasets["flag"]
        assert ds.datatype.cls == 8, p  # a real enum, not an int + attr
        assert ds.attributes["_enum_dict"] == emap, p
        assert ds.attributes["note"] == "kept", p
        np.testing.assert_array_equal(h5.read("flag"), [0, 1, 2, 1])

    sys.path.insert(0, "/root/repo/tools/refshim")
    try:
        import importlib

        nc4 = importlib.import_module("netCDF4")
        if "refshim" not in (nc4.__file__ or ""):
            import pytest

            pytest.skip("real netCDF4 present")
        for p in (p_mem, p_str):
            rd = nc4.Dataset(p, "r")
            np.testing.assert_array_equal(
                rd.variables["flag"][:], [0, 1, 2, 1]
            )
            assert rd.variables["flag"]._enum_dict == emap
            rd.close()
    finally:
        sys.path.remove("/root/repo/tools/refshim")
        # drop the cached shim so later tests that probe "is a real
        # netCDF4 importable?" (the declared library seam) see the
        # true environment
        sys.modules.pop("netCDF4", None)


def test_compound_file_readable_via_refshim(tmp_path):
    """The from-spec writer's compound output is readable through the
    refshim netCDF4 Dataset (structured array surface)."""
    import sys

    comp = np.zeros(6, dtype=np.dtype([("a", "<i4"), ("b", "<f8")]))
    comp["a"] = np.arange(6)
    comp["b"] = np.linspace(0.0, 1.0, 6)
    blob = write_hdf5(
        None,
        dims=[("time", 0)],
        variables={
            "time": (["time"], np.arange(6, dtype="float64")),
            "rec": (["time"], comp),
        },
        compression=4,
    )
    p = str(tmp_path / "c.nc4")
    open(p, "wb").write(blob)
    sys.path.insert(0, "/root/repo/tools/refshim")
    try:
        import importlib

        nc4 = importlib.import_module("netCDF4")
        if "refshim" not in (nc4.__file__ or ""):
            import pytest

            pytest.skip("real netCDF4 present")
        rd = nc4.Dataset(p, "r")
        out = rd.variables["rec"][:]
        assert out.dtype.names == ("a", "b")
        np.testing.assert_array_equal(out["a"], comp["a"])
        np.testing.assert_allclose(out["b"], comp["b"])
        rd.close()
    finally:
        sys.path.remove("/root/repo/tools/refshim")
        # drop the cached shim so later tests that probe "is a real
        # netCDF4 importable?" (the declared library seam) see the
        # true environment
        sys.modules.pop("netCDF4", None)
