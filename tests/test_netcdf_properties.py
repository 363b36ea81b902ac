"""Property-based invariants for the classic NetCDF reader/writer: ANY
combination of dims, dtypes, names, attribute sets, and record counts
must round-trip exactly. Catches layout/padding/endianness bugs the
example tests can't enumerate (the writer/reader pair is self-consistent
by construction, so these properties lean on byte-level invariants too:
every written file re-parses from a COPY of its bytes, truncation always
raises, and the version auto-selection matches the type set).
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ncagg_spark.sources.netcdf3 import (
    _CDF5_ONLY,
    _NP_TO_NC,
    read_netcdf3,
    write_netcdf3,
)

_DTYPES = sorted(_NP_TO_NC)  # int8..uint64, float32/64

_name = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz_0123456789"),
    min_size=1,
    max_size=12,
).filter(lambda s: not s[0].isdigit())


@st.composite
def nc_spec(draw):
    n_rec = draw(st.integers(min_value=0, max_value=9))
    inner = draw(st.integers(min_value=1, max_value=4))
    var_names = draw(
        st.lists(_name, min_size=1, max_size=5, unique=True)
    )
    variables = {}
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    for i, nm in enumerate(var_names):
        dt = draw(st.sampled_from(_DTYPES))
        two_d = draw(st.booleans())
        shape = (n_rec, inner) if two_d else (n_rec,)
        if dt.startswith("float"):
            arr = rng.standard_normal(shape).astype(dt)
        else:
            info = np.iinfo(dt)
            arr = rng.integers(
                info.min, info.max, size=shape, dtype=dt, endpoint=True
            )
        dims = ["rec", "inner"] if two_d else ["rec"]
        variables[nm] = (dims, arr)
    attrs = draw(
        st.dictionaries(
            _name,
            st.one_of(
                st.text(max_size=20),
                st.integers(-(2**31), 2**31 - 1).map(np.int32),
                st.lists(
                    st.floats(allow_nan=False, allow_infinity=False,
                              width=64),
                    min_size=1,
                    max_size=4,
                ).map(lambda v: np.array(v, dtype="float64")),
            ),
            max_size=4,
        )
    )
    return n_rec, inner, variables, attrs


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(nc_spec())
def test_roundtrip_property(spec):
    n_rec, inner, variables, attrs = spec
    blob = write_netcdf3(
        None,
        dims=[("rec", 0), ("inner", inner)],
        variables=variables,
        attributes=attrs,
    )
    f = read_netcdf3(bytes(blob))  # copy: no aliasing with writer buffers
    assert f.numrecs == n_rec
    # version auto-select matches type set
    uses_cdf5 = any(
        _NP_TO_NC[str(a.dtype)] in _CDF5_ONLY for _, a in variables.values()
    )
    assert f.version == (5 if uses_cdf5 else 2)
    for nm, (dims, arr) in variables.items():
        got = f.data[nm]
        assert got.dtype.newbyteorder("=") == arr.dtype
        np.testing.assert_array_equal(
            got.astype(arr.dtype), arr, err_msg=nm
        )
    for k, v in attrs.items():
        got = f.attributes[k]
        if isinstance(v, np.ndarray):
            assert got == (v.tolist() if v.size > 1 else v[0].item())
        elif isinstance(v, np.int32):
            assert got == int(v)
        else:
            assert got == v


@settings(max_examples=25, deadline=None)
@given(nc_spec(), st.integers(min_value=1, max_value=50))
def test_truncation_never_silently_corrupts(spec, cut):
    """Cutting bytes off the tail either raises (data bytes missing) or
    parses with every value still exact (only inter-record padding was
    cut) — a truncated file must never yield silently wrong data."""
    n_rec, inner, variables, attrs = spec
    blob = write_netcdf3(
        None,
        dims=[("rec", 0), ("inner", inner)],
        variables=variables,
        attributes=attrs,
    )
    cut = min(cut, len(blob) - 1)
    if cut <= 0:
        return
    try:
        f = read_netcdf3(blob[: len(blob) - cut])
    except ValueError:
        return
    for nm, (dims, arr) in variables.items():
        np.testing.assert_array_equal(
            f.data[nm].astype(arr.dtype), arr, err_msg=nm
        )
