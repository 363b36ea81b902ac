"""Pure-numpy NetCDF classic (CDF-1/2/5) reader + writer.

The container has no netCDF4/h5py/scipy, but the *classic* NetCDF format
is a small, fully public specification (the NetCDF "Classic Format Spec",
implemented from the format description — NOT ported from any library):

    magic 'CDF' + version (1: 32-bit offsets, 2: 64-bit offsets,
                           5: CDF-5, 64-bit sizes)
    numrecs | STREAMING
    dim_list  (NC_DIMENSION = 0x0A): name, length (0 => record dim)
    gatt_list (NC_ATTRIBUTE = 0x0C): name, nc_type, nelems, values
    var_list  (NC_VARIABLE  = 0x0B): name, dimids, vatts, nc_type,
                                     vsize, begin
    data: fixed vars contiguous at `begin`; record vars interleaved
          per-record with stride = sum of record-var record sizes
          (except the special case of exactly one record var: packed).

Everything is big-endian; names and values pad to 4-byte boundaries.

This gives the engine genuine day-one `.nc` ingestion for classic files
(the reference reads granules via the netCDF4 library,
ncagg/aggrelist.py:533-543). NetCDF-4/HDF5 files are a different
container format entirely and are gated behind the pluggable decoder in
sources/nc_granules.py.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass, field

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
NC_UBYTE, NC_USHORT, NC_UINT, NC_INT64, NC_UINT64 = 7, 8, 9, 10, 11

_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C
_STREAMING = 0xFFFFFFFF

# nc_type -> (big-endian numpy dtype, element size)
_DTYPES = {
    NC_BYTE: (">i1", 1),
    NC_CHAR: ("S1", 1),
    NC_SHORT: (">i2", 2),
    NC_INT: (">i4", 4),
    NC_FLOAT: (">f4", 4),
    NC_DOUBLE: (">f8", 8),
    NC_UBYTE: (">u1", 1),
    NC_USHORT: (">u2", 2),
    NC_UINT: (">u4", 4),
    NC_INT64: (">i8", 8),
    NC_UINT64: (">u8", 8),
}
_NP_TO_NC = {
    "int8": NC_BYTE,
    "int16": NC_SHORT,
    "int32": NC_INT,
    "float32": NC_FLOAT,
    "float64": NC_DOUBLE,
    "uint8": NC_UBYTE,
    "uint16": NC_USHORT,
    "uint32": NC_UINT,
    "int64": NC_INT64,
    "uint64": NC_UINT64,
}
# types beyond the classic-6 require CDF-5
_CDF5_ONLY = {NC_UBYTE, NC_USHORT, NC_UINT, NC_INT64, NC_UINT64}


@dataclass
class NcDim:
    name: str
    size: int  # 0 => record dimension


@dataclass
class NcVar:
    name: str
    dims: list[str]
    nc_type: int
    attributes: dict = field(default_factory=dict)
    # reader-side bookkeeping
    shape: tuple = ()
    is_record: bool = False
    _begin: int = 0
    _vsize: int = 0


@dataclass
class NcFile:
    dims: list[NcDim]
    variables: dict[str, NcVar]
    attributes: dict
    numrecs: int
    version: int
    data: dict  # name -> numpy array (record dim first when present)


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.o = 0

    def take(self, n: int) -> bytes:
        v = self.b[self.o : self.o + n]
        if len(v) != n:
            raise ValueError("truncated NetCDF classic file")
        self.o += n
        return v

    def u32(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def size_t(self, version: int) -> int:
        # CDF-5 widens every size/count field to 64 bits
        return self.i64() if version == 5 else self.i32()

    def name(self, version: int) -> str:
        n = self.size_t(version)
        s = self.take(n).decode("utf-8")
        pad = (4 - n % 4) % 4
        self.take(pad)
        return s

    def values(self, nc_type: int, nelems: int, version: int):
        dt, sz = _DTYPES[nc_type]
        raw = self.take(sz * nelems)
        pad = (4 - (sz * nelems) % 4) % 4
        self.take(pad)
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=dt)
        if nelems == 0:
            return []  # zero-length numeric attribute: legal classic
        return arr.tolist() if nelems > 1 else arr[0].item()

    def att_list(self, version: int) -> dict:
        tag = self.u32()
        count = self.size_t(version)
        if tag not in (_TAG_ATT, 0):
            raise ValueError(f"bad attribute tag {tag:#x}")
        out = {}
        for _ in range(count):
            nm = self.name(version)
            t = self.u32()
            n = self.size_t(version)
            out[nm] = self.values(t, n, version)
        return out


def is_netcdf3(head: bytes) -> bool:
    return head[:3] == b"CDF" and head[3:4] in (b"\x01", b"\x02", b"\x05")


def read_netcdf3(source) -> NcFile:
    """Parse a classic NetCDF file from bytes / file path / file object."""
    if isinstance(source, (bytes, bytearray)):
        buf = bytes(source)
    elif isinstance(source, str):
        with open(source, "rb") as f:
            buf = f.read()
    else:
        buf = source.read()
    if not is_netcdf3(buf[:4]):
        raise ValueError(
            "not a classic NetCDF file (NetCDF-4/HDF5 needs the pluggable "
            "decoder — see sources/nc_granules.py)"
        )
    version = buf[3]
    r = _Reader(buf)
    r.take(4)
    numrecs = r.i64() if version == 5 else r.u32()
    # CDF-5 reads numrecs signed, so the 64-bit all-ones STREAMING
    # sentinel arrives as -1 — missing it would silently decode 0 records
    streaming = numrecs == _STREAMING or numrecs < 0

    # dimensions
    tag = r.u32()
    ndims = r.size_t(version)
    if tag not in (_TAG_DIM, 0):
        raise ValueError(f"bad dimension tag {tag:#x}")
    dims: list[NcDim] = []
    for _ in range(ndims):
        nm = r.name(version)
        dims.append(NcDim(nm, r.size_t(version)))

    attributes = r.att_list(version)

    # variables
    tag = r.u32()
    nvars = r.size_t(version)
    if tag not in (_TAG_VAR, 0):
        raise ValueError(f"bad variable tag {tag:#x}")
    variables: dict[str, NcVar] = {}
    order: list[NcVar] = []
    for _ in range(nvars):
        nm = r.name(version)
        nd = r.size_t(version)
        dimids = [r.size_t(version) for _ in range(nd)]
        vatts = r.att_list(version)
        t = r.u32()
        vsize = r.size_t(version)
        begin = r.i64() if version >= 2 else r.u32()
        v = NcVar(
            name=nm,
            dims=[dims[i].name for i in dimids],
            nc_type=t,
            attributes=vatts,
        )
        v.is_record = bool(dimids) and dims[dimids[0]].size == 0
        v.shape = tuple(
            dims[i].size if dims[i].size else -1 for i in dimids
        )
        v._begin, v._vsize = begin, vsize
        variables[nm] = v
        order.append(v)

    rec_vars = [v for v in order if v.is_record]
    if streaming:
        # derive numrecs from file length (spec: streaming sentinel)
        if rec_vars:
            recsize = sum(v._vsize for v in rec_vars)
            if len(rec_vars) == 1:
                dt, sz = _DTYPES[rec_vars[0].nc_type]
                per = sz * int(
                    np.prod([s for s in rec_vars[0].shape[1:]] or [1])
                )
                recsize = per  # single record var: packed, no padding
            numrecs = (len(buf) - rec_vars[0]._begin) // max(recsize, 1)
        else:
            numrecs = 0

    data: dict[str, np.ndarray] = {}
    for v in order:
        dt, sz = _DTYPES[v.nc_type]
        inner = [s for s in v.shape[1:]] if v.is_record else list(v.shape)
        n_inner = int(np.prod(inner)) if inner else 1
        if not v.is_record:
            count = n_inner
            raw = buf[v._begin : v._begin + sz * count]
            arr = np.frombuffer(raw, dtype=dt).reshape(v.shape or ())
        else:
            # record data: interleaved with stride recsize; the
            # single-record-var special case is packed (stride = own size)
            per = sz * n_inner
            if len(rec_vars) == 1:
                stride = per
            else:
                stride = sum(rv._vsize for rv in rec_vars)
            # one vectorized read over the interleaved record stream
            # (a per-record frombuffer loop is O(numrecs) interpreter
            # overhead — minutes at 1M records). Contiguous when stride
            # == per (single record var); otherwise a zero-copy strided
            # view + ONE data-sized copy — no index matrix, no 8x blow-up
            if numrecs > 0:
                span = np.frombuffer(
                    buf,
                    dtype="u1",
                    count=(numrecs - 1) * stride + per,
                    offset=v._begin,
                )
                if stride == per:
                    raw = span
                else:
                    raw = np.lib.stride_tricks.as_strided(
                        span, shape=(numrecs, per), strides=(stride, 1)
                    ).reshape(-1)  # forces the copy into contiguity
                out = (
                    np.ascontiguousarray(raw)
                    .view(dt)
                    .reshape(numrecs, n_inner)
                )
            else:
                out = np.empty((0, n_inner), dtype=dt)
            arr = out.reshape((numrecs, *inner))
        data[v.name] = arr
    return NcFile(
        dims=dims,
        variables=variables,
        attributes=attributes,
        numrecs=numrecs,
        version=version,
        data=data,
    )


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


class _Writer:
    def __init__(self, version: int):
        self.version = version
        self.out = io.BytesIO()

    def raw(self, b: bytes):
        self.out.write(b)

    def u32(self, v: int):
        self.raw(struct.pack(">I", v))

    def i64(self, v: int):
        self.raw(struct.pack(">q", v))

    def size_t(self, v: int):
        self.i64(v) if self.version == 5 else self.u32(v)

    def name(self, s: str):
        b = s.encode("utf-8")
        self.size_t(len(b))
        self.raw(_pad4(b))

    def values(self, nc_type: int, vals):
        if nc_type == NC_CHAR:
            b = vals.encode("utf-8") if isinstance(vals, str) else bytes(vals)
            self.size_t(len(b))
            self.raw(_pad4(b))
            return
        arr = np.atleast_1d(np.asarray(vals)).astype(_DTYPES[nc_type][0])
        self.size_t(arr.size)
        self.raw(_pad4(arr.tobytes()))

    def att_list(self, attrs: dict):
        if not attrs:
            self.u32(0)
            self.size_t(0)
            return
        self.u32(_TAG_ATT)
        self.size_t(len(attrs))
        for k, v in attrs.items():
            self.name(k)
            t = _att_type(v)
            self.u32(t)
            self.values(t, v)


def _att_type(v) -> int:
    if isinstance(v, str):
        return NC_CHAR
    a = np.atleast_1d(np.asarray(v))
    return _NP_TO_NC[str(a.dtype)]


_I32_MIN, _I32_MAX = -(2**31), 2**31 - 1


def _coerce_classic_attrs(attrs: dict) -> tuple[dict, bool]:
    """Downcast CDF-5-only attribute types to classic equivalents.

    A plain Python int maps to NC_INT64 (CDF-5-only); embedding that in a
    CDF-1/2 header makes an invalid classic file that netCDF-C rejects.
    Per common netCDF practice, integer attributes that fit int32 become
    NC_INT; values that genuinely need 64 bits keep their type and the
    second return is False (caller must promote to CDF-5 or raise).
    """
    out, ok = {}, True
    for k, v in attrs.items():
        if isinstance(v, str):
            out[k] = v
            continue
        a = np.atleast_1d(np.asarray(v))
        t = _NP_TO_NC.get(str(a.dtype))
        if t in _CDF5_ONLY:
            if (
                np.issubdtype(a.dtype, np.integer)
                and a.size
                and int(a.min()) >= _I32_MIN
                and int(a.max()) <= _I32_MAX
            ):
                # keep numpy int32 (a plain Python int would re-map to
                # NC_INT64 at write time)
                a32 = a.astype(np.int32)
                out[k] = a32 if a32.size > 1 else a32[0]
            else:
                out[k] = v
                ok = False
        else:
            out[k] = v
    return out, ok


def write_netcdf3(
    path_or_buf,
    *,
    dims: list[tuple[str, int]],
    variables: dict[str, tuple[list[str], np.ndarray]],
    attributes: dict | None = None,
    var_attributes: dict[str, dict] | None = None,
    version: int | None = None,
    numrecs: int | None = None,
) -> bytes:
    """Write a classic NetCDF file.

    ``dims``: [(name, size)] with size 0 for THE record dimension.
    ``variables``: name -> (dim_names, array); record vars carry the
    record dim first and their arrays' first axis is the record count.
    Version auto-selects: 5 (CDF-5) if any 64-bit/unsigned type is used,
    else 2 (64-bit offsets classic).

    ``numrecs`` overrides the record count in the header — the streamed
    single-file export passes zero-length record arrays and appends the
    interleaved record stream itself (write_nc_aggregate_streamed).
    """
    attributes = attributes or {}
    var_attributes = var_attributes or {}
    dim_index = {n: i for i, (n, _) in enumerate(dims)}
    rec_dim = next((n for n, s in dims if s == 0), None)

    arrs: dict[str, np.ndarray] = {}
    nc_types: dict[str, int] = {}
    numrecs_given = numrecs
    numrecs = numrecs or 0
    for name, (vdims, arr) in variables.items():
        a = np.asarray(arr)
        if a.dtype.kind == "S":  # char matrix (classic string idiom)
            if a.dtype.itemsize != 1:
                raise ValueError(
                    f"char variable {name!r} must be S1 (got {a.dtype})"
                )
            t = NC_CHAR
        else:
            t = _NP_TO_NC.get(str(a.dtype))
        if t is None:
            raise ValueError(f"unsupported dtype {a.dtype} for {name!r}")
        arrs[name] = a.astype(_DTYPES[t][0])
        nc_types[name] = t
        if numrecs_given is None and vdims and vdims[0] == rec_dim:
            numrecs = max(numrecs, a.shape[0])

    # Version selection must account for ATTRIBUTE types too: a type-10
    # (NC_INT64) attribute inside a CDF-1/2 header is an invalid classic
    # file (ADVICE r4). Variables force CDF-5 as before; attributes are
    # first downcast to classic types when their values fit, and only
    # promote the version when they genuinely need 64 bits.
    var_needs5 = any(t in _CDF5_ONLY for t in nc_types.values())
    if version in (1, 2) and var_needs5:
        raise ValueError(
            "variable dtype requires CDF-5 but version="
            f"{version} was requested"
        )
    if version == 5 or (version is None and var_needs5):
        version = 5
    else:
        g_attrs, g_ok = _coerce_classic_attrs(attributes)
        v_attrs, v_ok = {}, True
        for vn, d in var_attributes.items():
            cd, ok = _coerce_classic_attrs(d)
            v_attrs[vn] = cd
            v_ok &= ok
        if g_ok and v_ok:
            attributes, var_attributes = g_attrs, v_attrs
            if version is None:
                version = 2
        elif version is None:
            version = 5
        else:
            raise ValueError(
                "attribute type requires CDF-5 but version="
                f"{version} was requested"
            )

    # variable headers need data offsets; lay out fixed vars first, then
    # record vars (spec ordering), computing vsize (padded) per var
    names = list(variables)
    fixed = [n for n in names if not (variables[n][0] and variables[n][0][0] == rec_dim)]
    record = [n for n in names if n not in fixed]

    def _per_record(n: str) -> int:
        sz = _DTYPES[nc_types[n]][1]
        inner = arrs[n].shape[1:] if n in record else arrs[n].shape
        cnt = int(np.prod(inner)) if inner else 1
        return sz * cnt

    vsizes: dict[str, int] = {}
    for n in fixed:
        raw = arrs[n].size * _DTYPES[nc_types[n]][1]
        vsizes[n] = raw + ((4 - raw % 4) % 4)
    for n in record:
        per = _per_record(n)
        vsizes[n] = per + ((4 - per % 4) % 4)

    # header size: serialize header once with dummy offsets to measure
    def _emit(begin_map: dict[str, int]) -> bytes:
        hw = _Writer(version)
        hw.raw(b"CDF" + bytes([version]))
        hw.i64(numrecs) if version == 5 else hw.u32(numrecs)
        hw.u32(_TAG_DIM if dims else 0)
        hw.size_t(len(dims))
        for n, s in dims:
            hw.name(n)
            hw.size_t(s)
        hw.att_list(attributes)
        hw.u32(_TAG_VAR if variables else 0)
        hw.size_t(len(variables))
        for n in fixed + record:
            vdims, _ = variables[n]
            hw.name(n)
            hw.size_t(len(vdims))
            for d in vdims:
                hw.size_t(dim_index[d])
            hw.att_list(var_attributes.get(n, {}))
            hw.u32(nc_types[n])
            hw.size_t(vsizes[n])
            hw.i64(begin_map[n]) if version >= 2 else hw.u32(begin_map[n])
        return hw.out.getvalue()

    dummy = {n: 0 for n in names}
    header_len = len(_emit(dummy))
    begins: dict[str, int] = {}
    off = header_len
    for n in fixed:
        begins[n] = off
        off += vsizes[n]
    rec_start = off
    roff = rec_start
    for n in record:
        begins[n] = roff
        roff += vsizes[n]

    body = io.BytesIO()
    body.write(_emit(begins))
    for n in fixed:
        body.write(_pad4(arrs[n].tobytes()))
    if record:
        recsize = sum(vsizes[n] for n in record)
        if numrecs_given is None:
            # unequal record counts would shift every later value in the
            # interleaved stream — fail loudly instead of corrupting
            short = {
                n: arrs[n].shape[0]
                for n in record
                if arrs[n].shape[0] != numrecs
            }
            if short:
                raise ValueError(
                    f"record variables disagree on record count "
                    f"(expected {numrecs}): {short}"
                )
        # numrecs override (streamed export): arrays hold fewer records
        # than the header claims — emit only the records actually present
        data_recs = (
            numrecs
            if numrecs_given is None
            else min(arrs[n].shape[0] for n in record)
        )
        if len(record) == 1:
            # single record var: packed, no per-record padding
            n = record[0]
            body.write(arrs[n].tobytes())
        else:
            for rec in range(data_recs):
                for n in record:
                    per = _per_record(n)
                    # slice (not index): a scalar from 1-D indexing drops
                    # the big-endian dtype and tobytes() goes native
                    chunk = arrs[n][rec : rec + 1].tobytes()
                    body.write(chunk + b"\x00" * (vsizes[n] - per))
    blob = body.getvalue()
    if isinstance(path_or_buf, str):
        with open(path_or_buf, "wb") as f:
            f.write(blob)
    elif path_or_buf is not None:
        path_or_buf.write(blob)
    return blob
