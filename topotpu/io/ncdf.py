"""netCDF4-compatible HDF5 tile files (no libnetcdf needed).

Parity target: the reference's tiled netCDF output (SURVEY.md §2.15 — tile
assembly + CF-metadata writer inside ``bin/mpi_interp_tair.py``). This
environment ships h5py but not netCDF4/xarray; since the netCDF-4 format IS
HDF5 plus dimension scales and a few attributes, this module writes files
that netCDF readers (and any HDF5 reader) open directly:

* one dataset per variable with attached dimension scales (time/lat/lon),
* CF attributes (units, standard_name, _FillValue, grid bounds),
* optional int16 packing (scale_factor/add_offset) — the convention climate
  archives use; halves output bandwidth, which SURVEY §7 flags as the
  production bottleneck.

Writes are atomic: <name>.tmp then os.replace, so a crashed run never leaves
a half-written tile and the manifest can trust file presence (SURVEY.md §5
idempotent-restart contract).
"""

from __future__ import annotations

import os
import pathlib

import h5py
import numpy as np

from topotpu.core.grid import GridSpec

FILL_I16 = np.int16(-32768)
FILL_F32 = np.float32(9.96921e36)  # CF default float fill


def _attach_dims(f: h5py.File, var, dims: tuple[str, ...]):
    for i, d in enumerate(dims):
        var.dims[i].attach_scale(f[d])


def _pack_int16(data: np.ndarray, valid_mask: np.ndarray | None):
    finite = np.isfinite(data)
    if valid_mask is not None:
        finite &= valid_mask
    if finite.any():
        lo = float(data[finite].min())
        hi = float(data[finite].max())
    else:
        lo, hi = 0.0, 1.0
    span = max(hi - lo, 1e-6)
    scale = span / 65500.0
    offset = (hi + lo) / 2.0
    safe = np.where(finite, data, offset)  # avoid NaN->int cast warnings
    packed = np.where(
        finite, np.round((safe - offset) / scale).astype(np.int16), FILL_I16
    )
    return packed, scale, offset


class TileWriter:
    """Write one tile's interpolation products as a netCDF4-style HDF5 file."""

    def __init__(
        self,
        path: str | pathlib.Path,
        subgrid: GridSpec,
        dates: np.ndarray,  # datetime64[D] calendar day axis
        pack: bool = True,
        compress: int = 1,  # gzip level; 0 = none (host gzip on this 1-core
                            # box is the production-write long pole)
    ):
        self.path = pathlib.Path(path)
        self.tmp = self.path.with_suffix(self.path.suffix + ".tmp")
        self.subgrid = subgrid
        self.dates = dates
        self.pack = pack
        self.compress = compress
        self._f = h5py.File(self.tmp, "w")
        self._init_coords()

    def _copts(self):
        if self.compress:
            return dict(compression="gzip", compression_opts=self.compress,
                        shuffle=True)
        return {}

    def _init_coords(self):
        f = self._f
        g = self.subgrid
        lat = g.lat0 - np.arange(g.nrows) * g.cellsize
        lon = g.lon0 + np.arange(g.ncols) * g.cellsize
        epoch = np.datetime64("1948-01-01", "D")
        time = (self.dates - epoch).astype(np.int32)

        for name, data, units, std in (
            ("lat", lat.astype(np.float64), "degrees_north", "latitude"),
            ("lon", lon.astype(np.float64), "degrees_east", "longitude"),
            ("time", time, "days since 1948-01-01 00:00:00", "time"),
            ("mth", np.arange(1, 13, dtype=np.int32), "month of year", "month"),
        ):
            d = f.create_dataset(name, data=data)
            d.make_scale(name)
            d.attrs["units"] = units
            d.attrs["standard_name"] = std
        f.attrs["Conventions"] = "CF-1.6"
        f.attrs["source"] = "topotpu"
        f.attrs["cellsize"] = self.subgrid.cellsize

    def write_daily(self, name: str, data: np.ndarray, units="C", long_name=""):
        """data: (ndays, nrows, ncols) float; NaN = masked."""
        f = self._f
        if self.pack:
            packed, scale, offset = _pack_int16(data, None)
            v = f.create_dataset(
                name, data=packed, chunks=(min(64, data.shape[0]),) + data.shape[1:],
                **self._copts(),
            )
            v.attrs["scale_factor"] = np.float32(scale)
            v.attrs["add_offset"] = np.float32(offset)
            v.attrs["_FillValue"] = FILL_I16
        else:
            v = f.create_dataset(
                name, data=np.where(np.isfinite(data), data, FILL_F32),
                chunks=(min(64, data.shape[0]),) + data.shape[1:],
                **self._copts(),
            )
            v.attrs["_FillValue"] = FILL_F32
        v.attrs["units"] = units
        v.attrs["long_name"] = long_name or name
        _attach_dims(f, v, ("time", "lat", "lon"))
        return v

    def write_daily_prepacked(self, name: str, data_i16: np.ndarray,
                              scale: float, offset: float,
                              units="C", long_name=""):
        """data already int16-quantized (device-side packing): (ndays, r, c)
        with FILL_I16 sentinel; scale/offset are the global decode params."""
        f = self._f
        v = f.create_dataset(
            name, data=data_i16,
            chunks=(min(64, data_i16.shape[0]),) + data_i16.shape[1:],
            **self._copts(),
        )
        v.attrs["scale_factor"] = np.float32(scale)
        v.attrs["add_offset"] = np.float32(offset)
        v.attrs["_FillValue"] = FILL_I16
        v.attrs["units"] = units
        v.attrs["long_name"] = long_name or name
        _attach_dims(f, v, ("time", "lat", "lon"))
        return v

    def write_monthly_prepacked(self, name: str, data_i16: np.ndarray,
                                scale: float, offset: float,
                                units="C", long_name=""):
        """(12, nrows, ncols) already int16-quantized (device-side packing)
        with FILL_I16 sentinel; scale/offset are the global decode params."""
        f = self._f
        v = f.create_dataset(name, data=data_i16, **self._copts())
        v.attrs["scale_factor"] = np.float32(scale)
        v.attrs["add_offset"] = np.float32(offset)
        v.attrs["_FillValue"] = FILL_I16
        v.attrs["units"] = units
        v.attrs["long_name"] = long_name or name
        _attach_dims(f, v, ("mth", "lat", "lon"))
        return v

    def write_monthly(self, name: str, data: np.ndarray, units="C", long_name=""):
        """data: (12, nrows, ncols) float; NaN = masked."""
        f = self._f
        v = f.create_dataset(
            name, data=np.where(np.isfinite(data), data, FILL_F32).astype(np.float32)
        )
        v.attrs["_FillValue"] = FILL_F32
        v.attrs["units"] = units
        v.attrs["long_name"] = long_name or name
        _attach_dims(f, v, ("mth", "lat", "lon"))
        return v

    def close(self):
        self._f.close()
        os.replace(self.tmp, self.path)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.close()
        else:  # leave no half-written artifact behind
            self._f.close()
            self.tmp.unlink(missing_ok=True)


def decode_array(data: np.ndarray, dset) -> np.ndarray:
    """Unpack raw values already read from ``dset`` (int16-packed or f32),
    applying scale/offset + fill semantics — for readers that keep the raw
    block around (e.g. to re-encode in place)."""
    if data.dtype == np.int16:
        scale = float(dset.attrs.get("scale_factor", 1.0))
        offset = float(dset.attrs.get("add_offset", 0.0))
        out = data.astype(np.float32) * scale + offset
        out[data == FILL_I16] = np.nan
        return out
    out = data.astype(np.float32)
    out[data == FILL_F32] = np.nan
    return out


def read_slice(dset, sl=Ellipsis) -> np.ndarray:
    """Decode a slice of an OPEN h5py dataset (int16-packed or f32),
    applying unpack + fill semantics — for streaming readers that must not
    load the whole variable (validate / cross-variable reconcile)."""
    return decode_array(dset[sl], dset)


def read_var(path, name: str) -> np.ndarray:
    """Read a variable back, applying unpack + fill semantics."""
    with h5py.File(path, "r") as f:
        return read_slice(f[name])
