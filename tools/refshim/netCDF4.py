"""Minimal netCDF4-python-compatible API backed by ncagg_spark's
from-spec codecs — just enough surface to run the REFERENCE ncagg
package unmodified in a sandbox without libnetcdf, for the head-to-head
benchmark (tools/bench_vs_reference.py).

Covers exactly what /root/reference/ncagg uses (audited call sites):
Dataset (modes r / w / r+, context manager), .dimensions /.variables /
ncattrs/getncattr/setncattr/setncatts, createDimension/createVariable,
Variable slicing read+append-write / chunking / set_auto_mask /
attribute access via __getattr__, num2date/date2num (scalar + array),
default_fillvals, and the _netCDF4.VLType marker class.

Reads decode through sources/nc_granules._decode (classic CDF-1/2/5 via
the pure-Python netCDF3 reader, netCDF-4 via the minimal HDF5 reader).
Writes buffer in memory (growable arrays along the record dimension)
and serialize ONCE at close through write_netcdf3 — so the reference's
aggregation compute runs bit-for-bit its own code while its I/O cost is
bounded below what libnetcdf's incremental compressed HDF5 writes would
cost. That bias FAVORS the reference in the benchmark comparison.

This module is import-shadowed onto sys.path by the bench script only;
nothing in ncagg_spark imports it.
"""

from __future__ import annotations

import os
import types
from datetime import timedelta

import numpy as np

from ncagg_spark.functions.time import _parse_units
from ncagg_spark.sources.nc_granules import _decode
from ncagg_spark.sources.netcdf3 import write_netcdf3

# the netCDF C library's documented default fill values (netcdf.h)
default_fillvals = {
    "S1": "\x00",
    "i1": -127,
    "u1": 255,
    "i2": -32767,
    "u2": 65535,
    "i4": -2147483647,
    "u4": 4294967295,
    "i8": -9223372036854775806,
    "u8": 18446744073709551614,
    "f4": 9.969209968386869e36,
    "f8": 9.969209968386869e36,
}


class VLType:
    """Marker for variable-length datatypes (isinstance checks only)."""

    def __init__(self, dtype=str, name="vlen"):
        self.dtype = dtype
        self.name = name


_netCDF4 = types.SimpleNamespace(VLType=VLType)


def num2date(value, units, calendar="standard"):
    scale, epoch = _parse_units(units)
    epoch = epoch.replace(tzinfo=None)  # reference compares naive

    def one(v):
        return epoch + timedelta(seconds=float(v) * scale)

    arr = np.asarray(value)
    if arr.ndim == 0:
        return one(arr.item())
    return np.array([one(v) for v in arr.ravel()]).reshape(arr.shape)


def date2num(dates, units, calendar="standard"):
    scale, epoch = _parse_units(units)
    epoch = epoch.replace(tzinfo=None)

    def one(d):
        if d.tzinfo is not None:
            d = d.replace(tzinfo=None)
        return (d - epoch).total_seconds() / scale

    if isinstance(dates, (list, tuple, np.ndarray)):
        return np.array([one(d) for d in dates])
    return one(dates)


def _scalarize(attrs: dict) -> dict:
    """netCDF4 returns single-value attributes as numpy scalars, never
    1-element arrays; mirror that so comparisons don't broadcast."""
    out = {}
    for k, v in attrs.items():
        if isinstance(v, np.ndarray) and v.ndim == 1 and v.size == 1:
            v = v[0]
        out[k] = v
    return out


class Dimension:
    def __init__(self, name, size, unlimited):
        self.name = name
        self._size = size
        self._unlimited = unlimited

    def isunlimited(self):
        return self._unlimited

    @property
    def size(self):
        return self._size


class Variable:
    def __init__(self, ds, name, dims, dtype, data, attributes,
                 fill_value=None):
        self._ds = ds
        self.name = name
        self.dimensions = tuple(dims)
        self.datatype = np.dtype(dtype)
        self._data = data
        self._attrs = _scalarize(dict(attributes or {}))
        if fill_value is not None and "_FillValue" not in self._attrs:
            self._attrs["_FillValue"] = fill_value

    # --- attribute surface -------------------------------------------------
    def ncattrs(self):
        return list(self._attrs.keys())

    def getncattr(self, k):
        return self._attrs[k]

    def setncattr(self, k, v):
        self._attrs[k] = v

    def setncatts(self, d):
        self._attrs.update(d)

    def __getattr__(self, k):
        # netCDF4 exposes attributes as python attrs (var.units,
        # var._FillValue); anything not found is an AttributeError so
        # hasattr() probes behave identically
        attrs = object.__getattribute__(self, "_attrs")
        if k in attrs:
            return attrs[k]
        raise AttributeError(k)

    def chunking(self):
        return "contiguous"

    def set_auto_mask(self, flag):
        pass  # reads return plain ndarrays already

    def set_auto_scale(self, flag):
        pass

    @property
    def shape(self):
        return self._data.shape

    @property
    def size(self):
        return self._data.size

    # --- data surface ------------------------------------------------------
    @staticmethod
    def _key(key):
        # netCDF4 accepts a LIST of slices (the reference passes one)
        if isinstance(key, list) and any(
            isinstance(k, slice) for k in key
        ):
            return tuple(key)
        return key

    def __getitem__(self, key):
        if self._data.ndim == 0:
            # netCDF4 is lenient: scalar_var[:] returns the value
            return np.array(self._data, copy=True)
        out = self._data[self._key(key)]
        return np.array(out, copy=True)

    def _grow_axis0(self, need):
        """Amortized-doubling growth along the record axis: thousands of
        per-component appends would otherwise be O(n^2) memcpy."""
        cur = self._data.shape[0]
        if need <= cur:
            return
        cap = getattr(self, "_cap", None)
        if cap is None or need > cap.shape[0]:
            new_cap = max(need, cur * 2, 64)
            fv = self._attrs.get("_FillValue", 0)
            shape = (new_cap,) + self._data.shape[1:]
            try:
                buf = np.full(shape, fv, dtype=self._data.dtype)
            except (ValueError, OverflowError):
                buf = np.zeros(shape, dtype=self._data.dtype)
            buf[:cur] = self._data
            self._cap = buf
        self._data = self._cap[:need]
        if self.dimensions:
            self._ds._grow_dim(self.dimensions[0], need)

    def __setitem__(self, key, value):
        if getattr(self._ds, "_mode", "w") == "r":
            # netCDF4-python raises on writes to a read-mode handle; the
            # decode cache shares arrays across read opens, so a silent
            # write here would corrupt every later open of the file in
            # this process (ADVICE r6)
            raise RuntimeError(
                "NetCDF: Write to read only"
            )
        key = self._key(key)
        if not isinstance(key, tuple):
            key = (key,)
        if isinstance(value, np.ma.MaskedArray):
            # netCDF4 writes masked entries as the fill value
            fv = self._attrs.get("_FillValue", 0)
            value = np.ma.filled(value, fill_value=fv)
        if self._data.ndim == 0:
            self._data = np.array(value, dtype=self._data.dtype)
            return
        # appends only ever extend axis 0 (the record dim comes first in
        # every reference product); grow it to the slice stop
        if key and isinstance(key[0], slice) and key[0].stop is not None:
            self._grow_axis0(int(key[0].stop))
        elif (
            key
            and isinstance(key[0], slice)  # array keys must not hit ==
            and key[0] == slice(None)
            and self.dimensions
            and self._ds.dimensions[self.dimensions[0]].isunlimited()
        ):
            value_arr = np.asarray(value)
            if value_arr.ndim:
                self._grow_axis0(value_arr.shape[0])
        self._data[key] = value


class Dataset:
    def __init__(self, filename, mode="r", **kwargs):
        self._filename = str(filename)
        self._mode = mode
        self._attrs: dict = {}
        self.dimensions: dict[str, Dimension] = {}
        self.variables: dict[str, Variable] = {}
        self._record_dim: str | None = None
        if mode in ("r", "r+"):
            self._load()
        elif mode != "w":
            raise ValueError(f"unsupported mode {mode!r}")

    # --- construction ------------------------------------------------------
    _decode_cache: dict = {}

    def _load(self):
        # read-only opens share one decoded file per (path, mtime): the
        # reference reopens each granule several times per aggregation
        # (InputFileNode probes + data_for), and libnetcdf under the OS
        # page cache would not re-parse either. Variable data stays a
        # VIEW here; __getitem__ copies on read, and r+ (the mutable
        # output handle) always loads fresh copies.
        cache_ok = self._mode == "r"
        key = None
        nc = None
        if cache_ok:
            try:
                key = (self._filename, os.path.getmtime(self._filename))
            except OSError:
                key = None
            if key is not None:
                nc = Dataset._decode_cache.get(key)
        if nc is None:
            with open(self._filename, "rb") as f:
                blob = f.read()
            nc = _decode(blob, "auto")
            if cache_ok and key is not None:
                if len(Dataset._decode_cache) > 256:
                    Dataset._decode_cache.clear()
                Dataset._decode_cache[key] = nc
        self._attrs = _scalarize(dict(nc.attributes))
        for d in nc.dims:
            unlimited = d.size == 0
            size = nc.numrecs if unlimited else d.size
            self.dimensions[d.name] = Dimension(d.name, size, unlimited)
            if unlimited:
                self._record_dim = d.name
        for name, v in nc.variables.items():
            data = nc.data.get(name)
            if data is None:
                continue
            if not cache_ok:
                data = np.array(data, copy=True)
            self.variables[name] = Variable(
                self, name, v.dims, data.dtype, data, v.attributes,
            )

    def createDimension(self, name, size=None):
        unlimited = size is None or size == 0
        self.dimensions[name] = Dimension(
            name, 0 if unlimited else int(size), unlimited
        )
        if unlimited:
            self._record_dim = name
        return self.dimensions[name]

    def createVariable(
        self, name, datatype, dimensions=(), fill_value=None, **kwargs
    ):
        dt = np.dtype(datatype) if not isinstance(
            datatype, VLType
        ) else np.dtype(object)
        shape = tuple(
            self.dimensions[d].size if not self.dimensions[d].isunlimited()
            else 0
            for d in dimensions
        )
        fv = fill_value
        if fv is None:
            try:
                fv = dt.type(default_fillvals[dt.str[1:]])
            except (KeyError, ValueError):
                fv = None
        try:
            init = np.full(shape, fv if fv is not None else 0, dtype=dt)
        except (ValueError, OverflowError):
            init = np.zeros(shape, dtype=dt)
        v = Variable(
            self, name, dimensions, dt, init, {}, fill_value=fv
        )
        self.variables[name] = v
        return v

    def _grow_dim(self, name, size):
        d = self.dimensions[name]
        if d.isunlimited() and size > d._size:
            d._size = size

    # --- attribute surface -------------------------------------------------
    def ncattrs(self):
        return list(self._attrs.keys())

    def getncattr(self, k):
        return self._attrs[k]

    def setncattr(self, k, v):
        self._attrs[k] = v

    def setncatts(self, d):
        self._attrs.update(d)

    def filepath(self):
        return self._filename

    def __getitem__(self, name):
        return self.variables[name]

    def sync(self):
        pass  # serialized once at close

    # --- persistence -------------------------------------------------------
    def close(self):
        if self._mode in ("w", "r+"):
            self._flush()

    def _flush(self):
        dims = []
        for name, d in self.dimensions.items():
            dims.append((name, 0 if d.isunlimited() else d.size))
        def _san(attrs):
            # classic-format writer takes str / numeric / numeric arrays;
            # normalize the numpy byte-string shapes netCDF4 tolerates
            out = {}
            for k, a in attrs.items():
                if isinstance(a, bytes):
                    a = a.decode("latin-1")
                elif isinstance(a, np.ndarray):
                    if a.dtype.kind == "S":
                        a = b"".join(a.ravel().tolist()).decode("latin-1")
                    elif a.dtype.byteorder == ">":
                        a = a.astype(a.dtype.newbyteorder("="))
                elif isinstance(a, np.generic):
                    if a.dtype.kind == "S":
                        a = a.item().decode("latin-1")
                    elif a.dtype.byteorder == ">":
                        a = a.item()
                out[k] = a
            return out

        variables = {}
        var_attributes = {}
        for name, v in self.variables.items():
            if v._data.dtype.kind in ("O", "U"):
                raise NotImplementedError(
                    "refshim: vlen/string variable serialization "
                    f"({name}) — out of scope for the benchmark shim"
                )
            arr = v._data
            if arr.dtype.byteorder == ">":
                arr = arr.astype(arr.dtype.newbyteorder("="))
            variables[name] = (list(v.dimensions), arr)
            var_attributes[name] = _san(v._attrs)
        write_netcdf3(
            self._filename,
            dims=dims,
            variables=variables,
            attributes=_san(self._attrs),
            var_attributes=var_attributes,
        )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
