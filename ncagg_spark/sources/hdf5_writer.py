"""Minimal pure-Python HDF5 *writer* — the netCDF-4 classic-model subset.

Implemented from the public HDF5 File Format Specification (version 3;
format spec, not library code), emitting the same structural choices the
netCDF-C library makes at its default (H5F_LIBVER_EARLIEST) settings:

  * superblock v0 (8-byte offsets/lengths, no checksum);
  * object headers v1 (no checksum), one header block per object;
  * old-style root group: v1 B-tree (type 0) + SNOD symbol nodes +
    local heap, names sorted;
  * dataspace v1, datatype v1 (fixed/float/string/reference/vlen),
    data layout v3 (contiguous, or chunked + v1 type-1 chunk B-tree
    with multi-level splitting), filter pipeline v1 (shuffle+deflate);
  * attributes as v1 messages (8-aligned name/datatype/dataspace);
  * the netCDF-4 dimension model: dimension-scale datasets
    (CLASS="DIMENSION_SCALE"), placeholder scales for dims without a
    coordinate variable, DIMENSION_LIST vlen-of-object-reference
    attributes backed by a global heap collection (GCOL).

The reference writes netCDF-4 output with per-variable chunksizes and
zlib compression (ncagg/aggregator.py:362-417, ncagg/cli.py:207-218);
this module gives the engine the same output container without any
netCDF/HDF5 library in the runtime. Files round-trip through the
sibling reader (sources/hdf5.py) — asserted in tests — and use only
structures whose layout the HDF5 spec fixes exactly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .hdf5 import fletcher32 as _fletcher32

UNDEF = 0xFFFFFFFFFFFFFFFF

# v1 B-tree fan-out: the superblock v0 carries no indexed-storage K, so
# the HDF5 default (K=32 => 2K=64 entries/node) is the interoperable cap.
_BTREE_MAX = 64
_PLACEHOLDER_NAME = (
    "This is a netCDF dimension but not a netCDF variable."
)


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _cap_chunk(
    chunk: tuple[int, ...], itemsize: int, cap_bytes: int = 1 << 24
) -> tuple[int, ...]:
    """Cap a DEFAULT chunk's record count so the chunk stays <= 16 MiB.

    Unbounded default chunks (min(nrecs, 4096) records x full inner
    dims) can exceed HDF5's 4 GiB chunk limit for wide variables — and
    the v1 B-tree key stores the stored-chunk size in 4 bytes, so an
    oversized chunk corrupts the index. Caller-specified chunksizes are
    not capped (validated at write instead)."""
    inner = 1
    for c in chunk[1:]:
        inner *= c
    max_first = max(1, cap_bytes // max(inner * itemsize, 1))
    return (min(chunk[0], max_first),) + tuple(chunk[1:])


# ---------------------------------------------------------------------------
# datatype / dataspace / attribute message encoding
# ---------------------------------------------------------------------------


def _dt_fixed(size: int, signed: bool) -> bytes:
    # class 0 (fixed point), v1; little-endian, bit 3 = signed
    bits0 = 0x08 if signed else 0x00
    head = struct.pack("<BBBBI", 0x10, bits0, 0, 0, size)
    return head + struct.pack("<HH", 0, 8 * size)


def _dt_float(size: int) -> bytes:
    # class 1 (float), v1; IEEE little-endian: mantissa norm = implied
    # MSB (bits 4-5 = 2), sign location = msb
    if size == 4:
        sign, exp_loc, exp_sz, man_sz, bias = 31, 23, 8, 23, 127
    elif size == 8:
        sign, exp_loc, exp_sz, man_sz, bias = 63, 52, 11, 52, 1023
    else:
        raise ValueError(f"float{size * 8} unsupported")
    head = struct.pack("<BBBBI", 0x11, 0x20, sign, 0, size)
    return head + struct.pack(
        "<HHBBBBI", 0, 8 * size, exp_loc, exp_sz, 0, man_sz, bias
    )


def _dt_string(size: int) -> bytes:
    # class 3 (string), v1; null-padded, ASCII
    return struct.pack("<BBBBI", 0x13, 0x00, 0, 0, max(size, 1))


def _dt_reference() -> bytes:
    # class 7 (reference), v1; object reference
    return struct.pack("<BBBBI", 0x17, 0x00, 0, 0, 8)


def _dt_vlen_ref() -> bytes:
    # class 9 (vlen sequence), base type = object reference
    return struct.pack("<BBBBI", 0x19, 0x00, 0, 0, 16) + _dt_reference()


def _np_datatype(dt: np.dtype) -> bytes:
    dt = np.dtype(dt)
    if dt.names:
        return _dt_compound(dt)
    if dt.kind in ("i", "u"):
        return _dt_fixed(dt.itemsize, dt.kind == "i")
    if dt.kind == "f":
        return _dt_float(dt.itemsize)
    if dt.kind == "S":
        return _dt_string(dt.itemsize)
    raise ValueError(f"unsupported dtype {dt} for HDF5 export")


def _dt_enum(base: np.dtype, mapping: dict[str, int]) -> bytes:
    """Class 8 (enum) v1: base datatype + 8-padded names + values."""
    base = np.dtype(base)
    n = len(mapping)
    head = struct.pack("<BBBBI", 0x18, n & 0xFF, n >> 8, 0, base.itemsize)
    body = _np_datatype(base)
    for nm in mapping:
        body += _pad8(nm.encode("utf-8") + b"\x00")
    body += np.array(list(mapping.values()), dtype=base.newbyteorder("<")).tobytes()
    return head + body


def _dt_compound(dt: np.dtype) -> bytes:
    """Class 6 (compound) v1 from a numpy structured dtype.

    Member subarrays use the v1 per-member dimensionality fields.
    """
    n = len(dt.names)
    head = struct.pack("<BBBBI", 0x16, n & 0xFF, n >> 8, 0, dt.itemsize)
    body = b""
    for nm in dt.names:
        fdt, off = dt.fields[nm][:2]
        if fdt.subdtype is not None:
            base, adims = fdt.subdtype
        else:
            base, adims = fdt, ()
        body += _pad8(nm.encode("utf-8") + b"\x00")
        body += struct.pack("<I", off)
        dims4 = tuple(adims) + (0,) * (4 - len(adims))
        body += struct.pack("<B3xI4x4I", len(adims), 0, *dims4)
        body += _np_datatype(base)
    return head + body


def _dataspace(shape: tuple, maxshape: tuple | None = None) -> bytes:
    rank = len(shape)
    flags = 0x1 if maxshape is not None else 0x0
    out = struct.pack("<BBB5x", 1, rank, flags)
    out += b"".join(struct.pack("<Q", d) for d in shape)
    if maxshape is not None:
        out += b"".join(struct.pack("<Q", d) for d in maxshape)
    return out


def _scalar_dataspace() -> bytes:
    return struct.pack("<BBB5x", 1, 0, 0)


def _attr_message(name: str, dt_msg: bytes, ds_msg: bytes, data: bytes) -> bytes:
    nm = name.encode("utf-8") + b"\x00"
    body = struct.pack("<BBHHH", 1, 0, len(nm), len(dt_msg), len(ds_msg))
    body += _pad8(nm) + _pad8(dt_msg) + _pad8(ds_msg) + data
    return body


def _encode_attr_value(v) -> tuple[bytes, bytes, bytes]:
    """value -> (datatype msg, dataspace msg, raw data)."""
    if isinstance(v, str):
        b = v.encode("utf-8") + b"\x00"
        return _dt_string(len(b)), _scalar_dataspace(), b
    a = np.atleast_1d(np.asarray(v))
    if a.dtype.kind == "U":
        raise ValueError("string arrays unsupported as attributes")
    if a.dtype.kind not in ("i", "u", "f"):
        raise ValueError(f"unsupported attribute dtype {a.dtype}")
    le = a.astype(a.dtype.newbyteorder("<"))
    scalar = np.ndim(v) == 0
    ds = _scalar_dataspace() if scalar else _dataspace((a.size,))
    return _np_datatype(a.dtype), ds, le.tobytes()


# ---------------------------------------------------------------------------
# object header / group machinery
# ---------------------------------------------------------------------------


def _object_header_v1(messages: list[tuple[int, bytes]]) -> bytes:
    body = b""
    for mtype, mdata in messages:
        mdata = _pad8(mdata)
        body += struct.pack("<HHB3x", mtype, len(mdata), 0) + mdata
    return (
        struct.pack("<BxHII4x", 1, len(messages), 1, len(body)) + body
    )


class ChunkedData:
    """A variable whose chunk data was ALREADY written into the builder
    (the streamed export path): write_hdf5 builds only the metadata
    (B-tree, headers) around the recorded (offsets, addr, size) entries.
    """

    def __init__(
        self,
        shape: tuple[int, ...],
        dtype,
        chunk: tuple[int, ...],
        entries: list[tuple[tuple[int, ...], int, int]],
        filters: list[tuple[int, bytes]],
    ):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.chunk = tuple(chunk)
        self.entries = sorted(entries)
        self.filters = filters
        self.size = 1
        for s in self.shape:
            self.size *= s


class _FileBuilder:
    def __init__(self):
        self.out = bytearray(b"\x00" * 96)  # superblock v0 reserved

    def alloc(self, data: bytes, align: int = 8) -> int:
        pad = (align - len(self.out) % align) % align
        self.out += b"\x00" * pad
        addr = len(self.out)
        self.out += data
        return addr

    def finish(self, root_header_addr: int, *, leaf_k: int = 4) -> bytes:
        sb = _superblock(len(self.out), root_header_addr, leaf_k)
        self.out[: len(sb)] = sb
        return bytes(self.out)


def _superblock(eof: int, root_header_addr: int, leaf_k: int) -> bytes:
    sb = struct.pack(
        "<8sBBBBBBBxHHI",
        b"\x89HDF\r\n\x1a\n",
        0,  # superblock v0
        0,  # free space v0
        0,  # root group symbol table v0
        0,  # reserved
        0,  # shared header v0
        8,  # offset size
        8,  # length size
        leaf_k,  # group leaf node K (2K symbols max per SNOD)
        16,  # group internal node K
        0,  # file consistency flags
    )
    sb += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    # root group symbol table entry: link name offset, header addr,
    # cache type 0
    sb += struct.pack("<QQI4x16x", 0, root_header_addr, 0)
    assert len(sb) <= 96
    return sb


class _FileBuilderDisk:
    """File-backed builder for the STREAMED export: chunk payloads
    append straight to disk (driver memory = one payload), metadata
    appends after them, and finish() patches the reserved superblock.
    Same alloc/finish contract as _FileBuilder."""

    def __init__(self, f):
        self.f = f
        self.f.write(b"\x00" * 96)
        self.pos = 96

    def alloc(self, data: bytes, align: int = 8) -> int:
        pad = (align - self.pos % align) % align
        if pad:
            self.f.write(b"\x00" * pad)
            self.pos += pad
        addr = self.pos
        self.f.write(data)
        self.pos += len(data)
        return addr

    def finish(self, root_header_addr: int, *, leaf_k: int = 4) -> None:
        sb = _superblock(self.pos, root_header_addr, leaf_k)
        self.f.flush()
        self.f.seek(0)
        self.f.write(sb)
        self.f.flush()


def _write_chunked(
    fb: _FileBuilder,
    arr: np.ndarray,
    chunk: tuple[int, ...],
    *,
    compression: int | None,
    shuffle: bool,
    fletcher32: bool = False,
) -> tuple[int, list[tuple[int, bytes]]]:
    """Write chunk data + v1 type-1 B-tree; return (btree addr, filters).

    Edge chunks are padded to the full chunk shape (the HDF5 storage
    contract); the B-tree splits into levels of <=64 entries so the
    default indexed-storage K stays honored at any chunk count.
    """
    esz = arr.dtype.itemsize
    filters = _chunk_filters(
        esz, compression=compression, shuffle=shuffle,
        fletcher32=fletcher32,
    )
    _validate_chunk_bytes(chunk, esz)

    grids = [range(0, max(s, 1), c) for s, c in zip(arr.shape, chunk)]
    entries = []  # (offsets, addr, stored_size)

    def _emit(offs: tuple[int, ...]):
        sl = tuple(
            slice(o, min(o + c, s))
            for o, c, s in zip(offs, chunk, arr.shape)
        )
        block = np.zeros(chunk, dtype=arr.dtype)
        block[tuple(slice(0, s.stop - s.start) for s in sl)] = arr[sl]
        raw = _encode_chunk_bytes(
            block.astype(arr.dtype.newbyteorder("<")).tobytes(),
            esz,
            compression=compression, shuffle=shuffle,
            fletcher32=fletcher32,
        )
        addr = fb.alloc(raw)
        entries.append((offs, addr, len(raw)))

    def _grid_walk(dim: int, prefix: tuple[int, ...]):
        if dim == len(grids):
            _emit(prefix)
            return
        for o in grids[dim]:
            _grid_walk(dim + 1, prefix + (o,))

    _grid_walk(0, ())
    root = _build_chunk_btree(fb, entries, arr.shape, chunk)
    return root, filters


def _chunk_filters(
    esz: int,
    *,
    compression: int | None,
    shuffle: bool,
    fletcher32: bool,
) -> list[tuple[int, bytes]]:
    filters: list[tuple[int, bytes]] = []
    if compression is not None:
        if shuffle:
            filters.append((2, struct.pack("<I", esz)))
        filters.append((1, struct.pack("<I", int(compression))))
    if fletcher32:
        # last in the pipeline: checksums the stored (post-filter) bytes
        filters.append((3, b""))
    return filters


def _validate_chunk_bytes(chunk: tuple[int, ...], esz: int) -> None:
    chunk_bytes = esz
    for c in chunk:
        chunk_bytes *= c
    if chunk_bytes >= 1 << 32:
        raise ValueError(
            f"chunk shape {chunk} = {chunk_bytes} bytes exceeds the "
            "4 GiB HDF5 chunk limit (the B-tree key size field is 4 "
            "bytes) — specify a smaller chunksize"
        )


def _encode_chunk_bytes(
    raw: bytes,
    esz: int,
    *,
    compression: int | None,
    shuffle: bool,
    fletcher32: bool,
) -> bytes:
    """Apply the write-side filter pipeline to one chunk's raw bytes."""
    if compression is not None:
        if shuffle:
            raw = (
                np.frombuffer(raw, dtype="u1")
                .reshape(len(raw) // esz, esz)
                .T.reshape(-1)
                .tobytes()
            )
        raw = zlib.compress(raw, int(compression))
    if fletcher32:
        raw += struct.pack("<I", _fletcher32(raw))
    return raw


def _build_chunk_btree(
    fb,
    entries: list[tuple[tuple[int, ...], int, int]],
    shape: tuple[int, ...],
    chunk: tuple[int, ...],
) -> int:
    """v1 type-1 chunk B-tree over already-written chunks.

    ``entries``: (chunk_offsets, addr, stored_size), MUST be sorted by
    offsets. Splits into levels of <=64 entries (honors K=32)."""

    def _key(offs: tuple[int, ...], size: int, mask: int = 0) -> bytes:
        return struct.pack("<II", size, mask) + b"".join(
            struct.pack("<Q", o) for o in offs
        ) + struct.pack("<Q", 0)  # trailing element-dim offset

    # past-the-end key: first chunk offset beyond the data in every dim
    end_offs = tuple(
        ((s + c - 1) // c) * c for s, c in zip(shape, chunk)
    )

    def _build_level(
        nodes: list[tuple[bytes, int]], level: int
    ) -> int:
        """nodes: [(first_key, node_addr)] -> btree root addr."""
        if len(nodes) == 1 and level > 0:
            return nodes[0][1]
        parents = []
        for i in range(0, len(nodes), _BTREE_MAX):
            grp = nodes[i : i + _BTREE_MAX]
            nxt_key = (
                nodes[i + _BTREE_MAX][0]
                if i + _BTREE_MAX < len(nodes)
                else _key(end_offs, 0)
            )
            body = struct.pack(
                "<4sBBHQQ", b"TREE", 1, level, len(grp), UNDEF, UNDEF
            )
            for k, child in grp:
                body += k + struct.pack("<Q", child)
            body += nxt_key
            parents.append((grp[0][0], fb.alloc(body)))
        if len(parents) == 1:
            return parents[0][1]
        return _build_level(parents, level + 1)

    leaves = []
    for i in range(0, len(entries), _BTREE_MAX):
        grp = entries[i : i + _BTREE_MAX]
        nxt = entries[i + _BTREE_MAX] if i + _BTREE_MAX < len(entries) else None
        body = struct.pack(
            "<4sBBHQQ", b"TREE", 1, 0, len(grp), UNDEF, UNDEF
        )
        for offs, addr, size in grp:
            body += _key(offs, size) + struct.pack("<Q", addr)
        body += _key(*(nxt[0], nxt[2])) if nxt else _key(end_offs, 0)
        leaves.append((_key(grp[0][0], grp[0][2]), fb.alloc(body)))
    return _build_level(leaves, 1) if len(leaves) > 1 else leaves[0][1]


def _filter_pipeline_msg(filters: list[tuple[int, bytes]]) -> bytes:
    # v1 pipeline: ver(1) nfilters(1) reserved(6), then per filter:
    # id(2) name_len(2)=0 flags(2) n_cvals(2) cvals (each 4B, odd count
    # padded)
    body = struct.pack("<BB6x", 1, len(filters))
    for fid, cvals in filters:
        ncv = len(cvals) // 4
        body += struct.pack("<HHHH", fid, 0, 0, ncv) + cvals
        if ncv % 2 == 1:
            body += b"\x00" * 4
    return body


def write_hdf5(
    path_or_buf,
    *,
    dims: list[tuple[str, int]],
    variables: dict[str, tuple[list[str], np.ndarray]],
    attributes: dict | None = None,
    var_attributes: dict[str, dict] | None = None,
    chunksizes: dict[str, tuple[int, ...]] | None = None,
    record_chunksize: int | None = None,
    compression: int | None = None,
    shuffle: bool = True,
    fletcher32: bool = False,
    enums: dict[str, dict[str, int]] | None = None,
    _builder=None,
) -> bytes:
    """Write a NetCDF-4 (HDF5 container) file.

    Mirrors ``write_netcdf3``'s interface: ``dims`` as [(name, size)]
    with size 0 for the unlimited/record dimension, ``variables`` as
    name -> (dim_names, array). ``chunksizes[name]`` sets a variable's
    chunk shape (the reference honors template chunksizes,
    ncagg/aggregator.py:362-417); unset record variables default to
    records-per-chunk min(nrecs, 4096) x full inner dims, or
    ``record_chunksize`` records per chunk when given (the reference's
    CLI ``-c udim:chunksize``, ncagg/cli.py:167-171). ``compression``
    is a zlib level (the reference uses 7) applied to chunked variables
    with a byte-shuffle filter. ``fletcher32`` appends the checksum
    filter (verified on re-read by the sibling reader). ``enums`` maps a
    variable name to a name->value dict, writing that variable as an
    HDF5 enum over its integer dtype; structured-dtype arrays write as
    compound datatypes (member subarrays via v1 dimensionality fields).
    """
    attributes = attributes or {}
    var_attributes = var_attributes or {}
    chunksizes = chunksizes or {}
    enums = enums or {}
    dim_sizes = dict(dims)
    rec_dim = next((n for n, s in dims if s == 0), None)
    numrecs = 0
    for name, (vdims, arr) in variables.items():
        if vdims and vdims[0] == rec_dim:
            shape0 = (
                arr.shape[0]
                if isinstance(arr, ChunkedData)
                else np.asarray(arr).shape[0]
            )
            numrecs = max(numrecs, shape0)

    collide = [
        n for n in variables
        if n in dim_sizes
        and not (variables[n][0] and variables[n][0][0] == n)
    ]
    if collide:
        # pass 1 would write the dim's placeholder scale under this
        # name and pass 2 would overwrite it, orphaning the scale —
        # netCDF-C renames such datasets to _nc4_non_coord_*; here the
        # collision is an explicit error
        raise ValueError(
            f"variable(s) {collide} share a dimension's name but are "
            "not its coordinate variable (first dim must be itself)"
        )

    fb = _builder if _builder is not None else _FileBuilder()
    header_addr: dict[str, int] = {}  # object name -> header addr

    def real_size(d: str) -> int:
        return numrecs if dim_sizes[d] == 0 else dim_sizes[d]

    def _dataset_header(
        name: str,
        arr: np.ndarray | None,
        shape: tuple[int, ...],
        maxshape: tuple[int, ...] | None,
        np_dt: np.dtype,
        extra_attrs: list[tuple[int, bytes]],
        chunk: tuple[int, ...] | None,
        dt_msg: bytes | None = None,
    ) -> int:
        msgs: list[tuple[int, bytes]] = []
        msgs.append((0x01, _dataspace(shape, maxshape)))
        msgs.append((0x03, dt_msg if dt_msg is not None else _np_datatype(np_dt)))
        if isinstance(arr, ChunkedData):
            # streamed path: chunks already on disk — metadata only
            btree = (
                _build_chunk_btree(fb, arr.entries, arr.shape, arr.chunk)
                if arr.entries
                else UNDEF
            )
            if arr.filters:
                msgs.append((0x0B, _filter_pipeline_msg(arr.filters)))
            lay = struct.pack("<BBBQ", 3, 2, len(arr.chunk) + 1, btree)
            lay += b"".join(struct.pack("<I", c) for c in arr.chunk)
            lay += struct.pack("<I", np_dt.itemsize)
            msgs.append((0x08, lay))
            msgs.extend(extra_attrs)
            return fb.alloc(_object_header_v1(msgs))
        if chunk is not None:
            if arr is not None and arr.size:
                btree, filters = _write_chunked(
                    fb, arr, chunk,
                    compression=compression, shuffle=shuffle,
                    fletcher32=fletcher32,
                )
            else:
                btree, filters = UNDEF, (
                    []
                    if compression is None
                    else (
                        [(2, struct.pack("<I", np_dt.itemsize))]
                        if shuffle
                        else []
                    )
                    + [(1, struct.pack("<I", int(compression)))]
                ) + ([(3, b"")] if fletcher32 else [])
            if filters:
                msgs.append((0x0B, _filter_pipeline_msg(filters)))
            lay = struct.pack("<BBBQ", 3, 2, len(chunk) + 1, btree)
            lay += b"".join(struct.pack("<I", c) for c in chunk)
            lay += struct.pack("<I", np_dt.itemsize)
            msgs.append((0x08, lay))
        else:
            if arr is not None and arr.size:
                raw = arr.astype(np_dt.newbyteorder("<")).tobytes()
                addr = fb.alloc(raw)
                size = len(raw)
            else:
                addr, size = UNDEF, 0
            msgs.append((0x08, struct.pack("<BBQQ", 3, 1, addr, size)))
        msgs.extend(extra_attrs)
        return fb.alloc(_object_header_v1(msgs))

    # -- pass 1: dimension-scale datasets (their header addresses feed
    #    the data variables' DIMENSION_LIST references) ------------------
    coord_vars = {
        n for n in variables
        if n in dim_sizes and variables[n][0] and variables[n][0][0] == n
    }
    for di, (dname, dsize) in enumerate(dims):
        size = real_size(dname)
        unlimited = dim_sizes[dname] == 0
        maxshape = (UNDEF,) if unlimited else None
        dimid_attr = _attr_message(
            "_Netcdf4Dimid",
            _dt_fixed(4, True),
            _scalar_dataspace(),
            struct.pack("<i", di),
        )
        cls_attr = _attr_message(
            "CLASS", *_encode_attr_value("DIMENSION_SCALE")
        )
        if dname in coord_vars:
            vdims, arr = variables[dname]
            a = arr if isinstance(arr, ChunkedData) else np.asarray(arr)
            chunk = chunksizes.get(dname)
            if chunk is None and unlimited:
                if record_chunksize:
                    chunk = (max(record_chunksize, 1),) + a.shape[1:]
                else:
                    chunk = _cap_chunk(
                        (min(max(size, 1), 4096),) + a.shape[1:],
                        a.dtype.itemsize,
                    )
            if chunk is None and compression is not None and a.size:
                # fixed coordinate vars compress too (template
                # chunksizes/zlib apply to every variable)
                chunk = _cap_chunk(
                    (min(max(a.shape[0], 1), 4096),) + a.shape[1:],
                    a.dtype.itemsize,
                )
            name_attr = _attr_message("NAME", *_encode_attr_value(dname))
            extra = [(0x0C, cls_attr), (0x0C, name_attr), (0x0C, dimid_attr)]
            for k, v in (var_attributes.get(dname) or {}).items():
                extra.append((0x0C, _attr_message(k, *_encode_attr_value(v))))
            header_addr[dname] = _dataset_header(
                dname, a, a.shape,
                (UNDEF,) + a.shape[1:] if unlimited else None,
                a.dtype, extra, chunk,
            )
        else:
            # placeholder scale: float32 dataset with no allocated data
            label = f"{_PLACEHOLDER_NAME}  {max(size, 1)}"
            name_attr = _attr_message("NAME", *_encode_attr_value(label))
            chunk = (min(max(size, 1), 4096),) if unlimited else None
            header_addr[dname] = _dataset_header(
                dname, None, (size,), maxshape, np.dtype("<f4"),
                [(0x0C, cls_attr), (0x0C, name_attr), (0x0C, dimid_attr)],
                chunk,
            )

    # -- global heap for DIMENSION_LIST object references ---------------
    data_vars = [n for n in variables if n not in coord_vars]
    gcol_objects: list[bytes] = []
    var_ref_idx: dict[str, list[int]] = {}
    for name in data_vars:
        vdims, _ = variables[name]
        idxs = []
        for d in vdims:
            gcol_objects.append(struct.pack("<Q", header_addr[d]))
            idxs.append(len(gcol_objects))  # heap ids are 1-based
        var_ref_idx[name] = idxs
    gcol_addr = UNDEF
    if gcol_objects:
        body = b""
        for i, obj in enumerate(gcol_objects, start=1):
            body += struct.pack("<HH4xQ", i, 1, len(obj)) + _pad8(obj)
        total = max(4096, 16 + len(body))
        free = total - (16 + len(body))
        if 0 < free < 16:  # free-space object needs its 16-byte header
            total += 16
            free += 16
        gcol = struct.pack("<4sB3xQ", b"GCOL", 1, total) + body
        if free:
            # spec-required free-space object: index 0, size = remaining
            # bytes INCLUDING this header (bare zero padding makes real
            # HDF5 readers reject the collection walk)
            gcol += struct.pack("<HH4xQ", 0, 0, free)
        gcol += b"\x00" * (total - len(gcol))
        gcol_addr = fb.alloc(gcol)

    # -- pass 2: data variables -----------------------------------------
    for name in data_vars:
        vdims, arr = variables[name]
        a = arr if isinstance(arr, ChunkedData) else np.asarray(arr)
        if not isinstance(a, ChunkedData) and a.dtype.kind == "b":
            a = a.astype("int8")
        shape = tuple(real_size(d) for d in vdims) if vdims else a.shape
        unlimited = bool(vdims) and dim_sizes[vdims[0]] == 0
        maxshape = ((UNDEF,) + shape[1:]) if unlimited else None
        chunk = chunksizes.get(name)
        if chunk is None and shape and (unlimited or compression is not None):
            if unlimited and record_chunksize:
                # explicit -c record chunking is honored uncapped like
                # chunksizes= (the 4 GiB guard still validates at write)
                chunk = (max(record_chunksize, 1),) + shape[1:]
            else:
                first = min(max(shape[0], 1), 4096)
                chunk = _cap_chunk(
                    (first,) + shape[1:], a.dtype.itemsize
                )
        if not shape:
            # HDF5 requires chunked datasets to have rank >= 1: scalar
            # variables always store contiguous (uncompressed)
            chunk = None
        extra: list[tuple[int, bytes]] = []
        if vdims:
            # DIMENSION_LIST: vlen(object ref) array, one per dim
            data = b"".join(
                struct.pack("<IQI", 1, gcol_addr, idx)
                for idx in var_ref_idx[name]
            )
            extra.append((
                0x0C,
                _attr_message(
                    "DIMENSION_LIST",
                    _dt_vlen_ref(),
                    _dataspace((len(vdims),)),
                    data,
                ),
            ))
        for k, v in (var_attributes.get(name) or {}).items():
            extra.append((0x0C, _attr_message(k, *_encode_attr_value(v))))
        header_addr[name] = _dataset_header(
            name, a, a.shape, maxshape, a.dtype, extra, chunk,
            dt_msg=_dt_enum(a.dtype, enums[name]) if name in enums else None,
        )

    # -- root group: local heap + SNOD + v1 B-tree ----------------------
    names = sorted(header_addr)
    heap_data = bytearray(b"\x00" * 8)  # offset 0: empty string
    name_off = {}
    for nm in names:
        name_off[nm] = len(heap_data)
        heap_data += nm.encode("utf-8") + b"\x00"
    heap_data = bytearray(_pad8(bytes(heap_data)))
    heap_data_addr = fb.alloc(bytes(heap_data))
    heap_hdr = struct.pack(
        "<4sB3xQQQ", b"HEAP", 0, len(heap_data), 1,  # 1 => no free list
        heap_data_addr,
    )
    heap_addr = fb.alloc(heap_hdr)

    snod = struct.pack("<4sBxH", b"SNOD", 1, len(names))
    for nm in names:
        snod += struct.pack(
            "<QQI4x16x", name_off[nm], header_addr[nm], 0
        )
    snod_addr = fb.alloc(snod)

    btree = struct.pack("<4sBBHQQ", b"TREE", 0, 0, 1, UNDEF, UNDEF)
    # key0 = offset of empty string; child; key1 = offset of last name
    btree += struct.pack("<QQQ", 0, snod_addr, name_off[names[-1]])
    btree_addr = fb.alloc(btree)

    root_msgs: list[tuple[int, bytes]] = [
        (0x11, struct.pack("<QQ", btree_addr, heap_addr))
    ]
    for k, v in attributes.items():
        root_msgs.append((0x0C, _attr_message(k, *_encode_attr_value(v))))
    root_addr = fb.alloc(_object_header_v1(root_msgs))

    # the single SNOD holds every name, so the superblock's group-leaf K
    # must satisfy nsyms <= 2K or libhdf5 rejects the node
    blob = fb.finish(root_addr, leaf_k=max(4, (len(names) + 1) // 2))
    if blob is None:  # disk builder: already on disk
        return None
    if isinstance(path_or_buf, str):
        with open(path_or_buf, "wb") as f:
            f.write(blob)
    elif path_or_buf is not None:
        path_or_buf.write(blob)
    return blob
