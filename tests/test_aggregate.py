"""aggregate stage: monthly/annual means streamed from daily mosaics,
for both int16-packed and unpacked f32 layouts."""

import dataclasses

import h5py
import numpy as np

from topotpu.cli.steps import step_aggregate
from topotpu.core.config import TopoConfig
from topotpu.io.ncdf import FILL_F32, FILL_I16, read_var


def _write_mosaic(path, var, daily, dates, packed):
    """Minimal mosaic file: the daily dataset + CF time/lat/lon scales —
    all step_aggregate reads."""
    epoch = np.datetime64("1948-01-01", "D")
    with h5py.File(path, "w") as f:
        f.create_dataset("time", data=(dates - epoch).astype(np.int32))
        for axis, n in (("lat", daily.shape[1]), ("lon", daily.shape[2])):
            sc = f.create_dataset(axis, data=np.arange(n, dtype=np.float64))
            sc.attrs["units"] = (
                "degrees_north" if axis == "lat" else "degrees_east"
            )
            sc.make_scale(axis)
        if packed:
            scale, offset = 0.01, 5.0
            raw = np.where(
                np.isfinite(daily),
                np.rint((daily - offset) / scale),
                float(FILL_I16),
            ).astype(np.int16)
            d = f.create_dataset(var, data=raw)
            d.attrs["scale_factor"] = np.float32(scale)
            d.attrs["add_offset"] = np.float32(offset)
        else:
            d = f.create_dataset(
                var,
                data=np.where(np.isfinite(daily), daily, FILL_F32).astype(
                    np.float32
                ),
            )
        d.attrs["_FillValue"] = FILL_I16 if packed else FILL_F32


def _run(tmp_path, packed):
    # 14 months spanning a year boundary, with a PARTIAL leading month
    # (Dec 15-31) and partial years on both sides
    dates = np.arange(
        np.datetime64("2014-12-15"), np.datetime64("2016-02-01")
    )
    nd = len(dates)
    rng = np.random.default_rng(5)
    daily = rng.normal(10.0, 3.0, (nd, 4, 5)).astype(np.float32)
    daily[:, 0, 0] = np.nan            # never-covered cell
    daily[3, 1, 1] = np.nan            # one December day missing
    for var in ("tmin", "tmax"):
        _write_mosaic(
            tmp_path / f"mosaic_{var}.h5", var, daily, dates, packed
        )
    cfg = dataclasses.replace(TopoConfig(), data_dir=str(tmp_path))
    out = step_aggregate(cfg)
    assert out["tmin"]["months"] == 14 and out["tmin"]["years"] == 3
    mon = read_var(tmp_path / "agg_tmin.h5", "monthly")
    ann = read_var(tmp_path / "agg_tmin.h5", "annual")
    assert mon.shape == (14, 4, 5) and ann.shape == (3, 4, 5)

    tol = 0.011 if packed else 1e-4
    # per-month means with strict finiteness
    ym = dates.astype("datetime64[M]")
    for mi, m in enumerate(np.unique(ym)):
        blk = daily[ym == m]
        ref = np.where(np.isfinite(blk).all(0), blk.mean(0), np.nan)
        assert np.array_equal(np.isfinite(ref), np.isfinite(mon[mi])), mi
        ok = np.isfinite(ref)
        assert np.abs(mon[mi] - ref)[ok].max() <= tol + (
            0.01 if packed else 0.0  # re-quantization of the input
        )
    # the missing Dec-2014 day kills Dec's mean AND 2014's annual at (1,1)
    assert not np.isfinite(mon[0, 1, 1])
    assert not np.isfinite(ann[0, 1, 1])
    assert np.isfinite(ann[1, 1, 1])   # 2015 unaffected
    assert not np.isfinite(ann[:, 0, 0]).any()
    # 2015 annual == day-weighted mean over the full year
    y = dates.astype("datetime64[Y]") == np.datetime64("2015")
    refy = daily[y].mean(0)
    oky = np.isfinite(refy)
    assert np.abs(ann[1] - refy)[oky].max() <= tol + (
        0.01 if packed else 0.0
    )
    # calendar metadata: month-start timestamps, member-day counts (the
    # partial leading month is only distinguishable through n_days), and
    # CF lat/lon scales copied from the mosaic with dims attached
    with h5py.File(tmp_path / "agg_tmin.h5") as f:
        assert list(f["year"][...]) == [2014, 2015, 2016]
        epoch = np.datetime64("1948-01-01", "D")
        t0 = epoch + np.timedelta64(int(f["time_month"][0]), "D")
        assert t0 == np.datetime64("2014-12-01")
        assert list(f["n_days"][:2]) == [17, 31]
        assert list(f["n_days_year"][...]) == [17, 365, 31]
        assert f["lat"].attrs["units"] == "degrees_north"
        assert f["monthly"].dims[1][0] == f["lat"]
        assert f["annual"].dims[0][0] == f["year"]


def test_aggregate_packed(tmp_path):
    _run(tmp_path, packed=True)


def test_aggregate_f32(tmp_path):
    _run(tmp_path, packed=False)


def test_aggregate_refuses_incomplete_direct_mosaic(tmp_path):
    """Direct-mode mosaics are written in place; until 'complete' is
    stamped the file may be a partial product of a crashed/running interp.
    Aggregating it would silently emit hole-filled means — the stage must
    report 'incomplete' instead, and proceed once the attr is set."""
    dates = np.arange(np.datetime64("2015-01-01"), np.datetime64("2015-03-01"))
    daily = np.full((len(dates), 3, 3), 7.5, np.float32)
    for var in ("tmin", "tmax"):
        path = tmp_path / f"mosaic_{var}.h5"
        _write_mosaic(path, var, daily, dates, packed=True)
        with h5py.File(path, "r+") as f:
            f.attrs["layout"] = "direct"   # no 'complete' attr: mid-write
    cfg = dataclasses.replace(TopoConfig(), data_dir=str(tmp_path))
    out = step_aggregate(cfg)
    assert out["tmin"]["status"] == "incomplete"
    assert out["tmax"]["status"] == "incomplete"
    assert not (tmp_path / "agg_tmin.h5").exists()

    for var in ("tmin", "tmax"):
        with h5py.File(tmp_path / f"mosaic_{var}.h5", "r+") as f:
            f.attrs["complete"] = True
    out = step_aggregate(cfg)
    assert out["tmin"]["months"] == 2
    assert (tmp_path / "agg_tmin.h5").exists()
