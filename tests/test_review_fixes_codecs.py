"""Regression tests for the codec deep-review findings: shared object
header messages, HDF5 fill-value messages, SNOD K sizing, GCOL free
space, chunk-size caps, fixed-coord compression, variable/dim name
collisions, and classic-format record/attribute edge cases.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ncagg_spark.sources.hdf5 import Hdf5Error, Hdf5File, read_hdf5
from ncagg_spark.sources.hdf5_writer import _cap_chunk, write_hdf5
from ncagg_spark.sources.netcdf3 import read_netcdf3, write_netcdf3


from tests.conftest import dt_i32_msg as _dt_i32_msg


def test_shared_message_resolves_committed_datatype():
    """A dataset datatype stored as a shared-message reference (what
    netCDF-C writes for committed enum/compound types) must resolve to
    the committed type's message, not be parsed as inline bytes."""
    # build a buffer holding a v1 object header with one datatype msg
    dt = _dt_i32_msg()
    body = struct.pack("<HHB3x", 0x03, len(dt) + (8 - len(dt) % 8) % 8, 0)
    body += dt + b"\x00" * ((8 - len(dt) % 8) % 8)
    hdr = struct.pack("<BxHII4x", 1, 1, 1, len(body)) + body
    f = Hdf5File.__new__(Hdf5File)
    f.buf = b"\x00" * 64 + hdr  # committed type lives at addr 64
    # v2 shared-message blob: version, type, address
    shared_v2 = struct.pack("<BBQ", 2, 2, 64)
    out = f._resolve_shared(0x03, shared_v2)
    assert out[:8] == dt[:8]
    dtp = f._parse_datatype(out)
    assert dtp.np_dtype == np.dtype("<i4")
    # v1 form: version, type, 6 reserved, address
    shared_v1 = struct.pack("<BB6xQ", 1, 2, 64)
    assert f._resolve_shared(0x03, shared_v1)[:8] == dt[:8]
    with pytest.raises(Hdf5Error, match="SOHM"):
        f._resolve_shared(0x03, struct.pack("<BBQ", 3, 1, 64))


def test_decode_fill_value_versions():
    f = Hdf5File.__new__(Hdf5File)
    dt = f._parse_datatype(_dt_i32_msg())
    val = struct.pack("<i", -2147483647)  # NC_FILL_INT
    # v2 defined
    msg = struct.pack("<BBBB", 2, 2, 0, 1) + struct.pack("<I", 4) + val
    assert f._decode_fill(("new", msg), dt) == -2147483647
    # v2 undefined
    msg = struct.pack("<BBBB", 2, 2, 0, 0)
    assert f._decode_fill(("new", msg), dt) is None
    # v3 defined (flag bit 5)
    msg = struct.pack("<BB", 3, 0x20) + struct.pack("<I", 4) + val
    assert f._decode_fill(("new", msg), dt) == -2147483647
    # v3 undefined
    msg = struct.pack("<BB", 3, 0x10)
    assert f._decode_fill(("new", msg), dt) is None
    # old-style
    msg = struct.pack("<I", 4) + val
    assert f._decode_fill(("old", msg), dt) == -2147483647


def test_snod_leaf_k_covers_many_objects():
    """>8 root objects previously violated the declared group-leaf K=4
    (2K=8 symbols max), making files unreadable by libhdf5."""
    variables = {"time": (["time"], np.arange(4, dtype="float64"))}
    for i in range(12):
        variables[f"v{i:02d}"] = (["time"], np.arange(4, dtype="float64"))
    blob = write_hdf5(None, dims=[("time", 0)], variables=variables)
    leaf_k = struct.unpack("<H", blob[16:18])[0]
    n_objects = 13  # time + 12 data vars
    assert leaf_k * 2 >= n_objects
    h5 = read_hdf5(blob)
    assert len(h5.datasets) == n_objects


def test_gcol_free_space_object_written():
    blob = write_hdf5(
        None,
        dims=[("time", 0)],
        variables={"time": (["time"], np.arange(3, dtype="float64")),
                   "v": (["time"], np.arange(3, dtype="int64"))},
    )
    at = blob.find(b"GCOL")
    assert at > 0
    total = struct.unpack("<Q", blob[at + 8 : at + 16])[0]
    # walk objects; the final one must be the index-0 free-space object
    # whose size covers the remaining bytes exactly
    p = at + 16
    end = at + total
    while p < end:
        idx, _ref = struct.unpack("<HH", blob[p : p + 4])
        size = struct.unpack("<Q", blob[p + 8 : p + 16])[0]
        if idx == 0:
            assert size == end - p
            break
        p += 16 + (size + 7) // 8 * 8
    else:
        pytest.fail("no free-space object found in GCOL")


def test_default_chunk_capped_and_huge_explicit_chunk_rejected():
    assert _cap_chunk((4096, 1 << 20), 8) == (2, 1 << 20)
    assert _cap_chunk((4096, 8), 8) == (4096, 8)
    with pytest.raises(ValueError, match="4 GiB"):
        write_hdf5(
            None,
            dims=[("time", 0), ("w", 1 << 20)],
            variables={
                "time": (["time"], np.arange(2, dtype="float64")),
                "v": (
                    ["time", "w"],
                    np.zeros((2, 1 << 20), dtype="float64"),
                ),
            },
            chunksizes={"v": (1 << 12, 1 << 20)},  # 32 GiB chunk
        )


def test_fixed_coord_var_compresses():
    cal = np.linspace(0.0, 1.0, 512)
    blob = write_hdf5(
        None,
        dims=[("time", 0), ("cal", 512)],
        variables={
            "time": (["time"], np.arange(4, dtype="float64")),
            "cal": (["cal"], cal),
            "v": (["time", "cal"], np.zeros((4, 512))),
        },
        compression=6,
    )
    h5 = read_hdf5(blob)
    assert h5.datasets["cal"].filters  # chunked + deflate applied
    np.testing.assert_allclose(h5.read("cal"), cal)


def test_variable_colliding_with_noncoord_dim_rejected():
    with pytest.raises(ValueError, match="coordinate"):
        write_hdf5(
            None,
            dims=[("x", 4), ("t", 0)],
            variables={
                "t": (["t"], np.arange(2, dtype="float64")),
                "x": (["t"], np.arange(2, dtype="float64")),
            },
        )


def test_netcdf3_unequal_record_counts_rejected():
    with pytest.raises(ValueError, match="disagree"):
        write_netcdf3(
            None,
            dims=[("t", 0)],
            variables={
                "a": (["t"], np.arange(5, dtype="float64")),
                "b": (["t"], np.arange(3, dtype="float64")),
            },
        )


def test_netcdf3_empty_numeric_attribute_roundtrip():
    blob = write_netcdf3(
        None,
        dims=[("t", 0)],
        variables={"t": (["t"], np.arange(2, dtype="float64"))},
        attributes={"empty": []},
    )
    nc = read_netcdf3(blob)
    assert nc.attributes["empty"] == []


def test_netcdf3_vectorized_record_read_matches():
    # multi-record-var interleaving, incl. a 2-D record var
    a = np.arange(7, dtype="float64")
    b = np.arange(21, dtype="int32").reshape(7, 3)
    blob = write_netcdf3(
        None,
        dims=[("t", 0), ("k", 3)],
        variables={"a": (["t"], a), "b": (["t", "k"], b)},
    )
    nc = read_netcdf3(blob)
    np.testing.assert_array_equal(nc.data["a"], a)
    np.testing.assert_array_equal(nc.data["b"], b)


def test_record_chunksize_honored_uncapped():
    # explicit -c chunking must not be silently shrunk by the 16 MiB
    # default cap (the reference honors -c exactly)
    blob = write_hdf5(
        None,
        dims=[("time", 0), ("w", 1 << 16)],
        variables={
            "time": (["time"], np.arange(8, dtype="float64")),
            "v": (["time", "w"], np.zeros((8, 1 << 16), dtype="float64")),
        },
        record_chunksize=64,  # 64 * 65536 * 8 = 32 MiB > the 16 MiB cap
    )
    h5 = read_hdf5(blob)
    assert h5.datasets["v"].layout["chunk"] == (64, 1 << 16)


def test_decode_fill_array_datatype_returns_none():
    f = Hdf5File.__new__(Hdf5File)
    base = f._parse_datatype(_dt_i32_msg())
    from ncagg_spark.sources.hdf5 import Datatype

    arr_dt = Datatype(
        cls=10, size=12, np_dtype=np.dtype(("<i4", (3,)))
    )
    msg = struct.pack("<BB", 3, 0x20) + struct.pack("<I", 12) + b"\x00" * 12
    assert f._decode_fill(("new", msg), arr_dt) is None
    assert f._decode_fill(("new", msg), base) is not None
