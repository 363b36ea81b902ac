"""Property-based invariants for the from-spec HDF5/netCDF-4 writer +
reader pair: ANY combination of dims, dtypes (ints, floats, fixed
strings), shapes, chunking, compression level, and attributes must
round-trip exactly through write_hdf5 -> read_hdf5. The reader was
proven against the reference's real granules, so the round trip anchors
the writer to independently-validated decode behavior."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ncagg_spark.sources.hdf5 import read_hdf5
from ncagg_spark.sources.hdf5_writer import write_hdf5

_DTYPES = ["int8", "int16", "int32", "int64", "uint8", "float32", "float64"]

_name = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz_0123456789"),
    min_size=1,
    max_size=10,
).filter(lambda s: not s[0].isdigit())


@st.composite
def h5_spec(draw):
    n_rec = draw(st.integers(min_value=1, max_value=40))
    inner = draw(st.integers(min_value=1, max_value=5))
    var_names = draw(st.lists(_name, min_size=1, max_size=4, unique=True))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    variables = {}
    for nm in var_names:
        kind = draw(st.sampled_from(["num1d", "num2d", "str"]))
        if kind == "str":
            width = draw(st.integers(min_value=1, max_value=6))
            pool = [b"x" * draw(st.integers(0, width)) for _ in range(4)]
            arr = np.array(
                [pool[int(rng.integers(0, 4))] for _ in range(n_rec)],
                dtype=f"S{width}",
            )
            variables[nm] = (["rec"], arr)
            continue
        dt = draw(st.sampled_from(_DTYPES))
        shape = (n_rec, inner) if kind == "num2d" else (n_rec,)
        if dt.startswith("float"):
            arr = rng.standard_normal(shape).astype(dt)
        else:
            info = np.iinfo(dt)
            arr = rng.integers(
                info.min, info.max, size=shape, dtype=dt, endpoint=True
            )
        dims = ["rec", "inner"] if kind == "num2d" else ["rec"]
        variables[nm] = (dims, arr)
    attrs = draw(
        st.dictionaries(
            _name,
            st.one_of(
                st.text(
                    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                    max_size=16,
                ),
                st.integers(-(2**31), 2**31 - 1).map(np.int32),
                st.floats(allow_nan=False, allow_infinity=False, width=32),
            ),
            max_size=3,
        )
    )
    compression = draw(st.sampled_from([None, 1, 5]))
    rec_chunk = draw(st.sampled_from([None, 1, 7, 4096]))
    return n_rec, inner, variables, attrs, compression, rec_chunk


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(h5_spec())
def test_hdf5_roundtrip_exact(spec):
    n_rec, inner, variables, attrs, compression, rec_chunk = spec
    blob = write_hdf5(
        None,
        dims=[("rec", 0), ("inner", inner)],
        variables=variables,
        attributes=attrs,
        compression=compression,
        record_chunksize=rec_chunk,
    )
    h5 = read_hdf5(blob)
    assert h5.buf[:8] == b"\x89HDF\r\n\x1a\n"
    for nm, (dims, arr) in variables.items():
        got = h5.read(nm)
        assert got.shape == arr.shape, nm
        if arr.dtype.kind == "S":
            assert [bytes(x) for x in got] == [bytes(x) for x in arr], nm
        else:
            np.testing.assert_array_equal(
                got, arr.astype(arr.dtype.newbyteorder("<")), err_msg=nm
            )
    for k, v in attrs.items():
        rv = h5.root_attributes[k]
        if isinstance(v, str):
            assert rv == v, k
        else:
            assert np.isclose(float(rv), float(v), rtol=0, atol=0), k
