"""BASELINE config #5 in miniature: multi-year chunked production run must
match a single-span run exactly (normals) and per-day (dailies), with
independent per-chunk resume."""

import numpy as np
import pytest

from topotpu.core.config import TopoConfig, InterpParams, MeshParams
from topotpu.core.dates import get_days_metadata
from topotpu.dist.engine import TileEngine, StationSet
from topotpu.io.ncdf import read_var
from topotpu.io.rasters import RasterStack
from topotpu.io.synthetic import make_world


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(41)
    days = get_days_metadata("2008-01-01", "2015-12-31")  # 8 years
    world = make_world(rng, nrows=24, ncols=24, n_stations=60,
                      ndays=days.ndays)
    rasters = RasterStack.from_world(world)
    nug, ps, rg = world.true_vario
    stations = StationSet(
        lon=world.stn_lon, lat=world.stn_lat, elev=world.stn_elev,
        tdi=world.stn_tdi, lst=world.stn_lst, norm=world.stn_norm,
        vario=np.tile(np.array([nug, ps, rg], np.float32), (60, 12, 1)),
        valid=np.ones((60, 12), bool),
        anoms=world.stn_anoms.astype(np.float32),
    )
    return world, days, rasters, stations


def _config():
    return TopoConfig(
        start_date="2008-01-01", end_date="2015-12-31",
        tile_rows=24, tile_cols=24,
        interp=InterpParams(k_neighbors=16, max_tile_stations=64),
        mesh=MeshParams(n_devices=8),
    )


def test_chunked_equals_full_span(tmp_path, setup):
    world, days, rasters, stations = setup
    cfg = _config()

    full = TileEngine(cfg, rasters, days, tmp_path / "full")
    assert full.run("tmin", stations, progress=False) == 1

    chunked = TileEngine(cfg, rasters, days, tmp_path / "chunks")
    assert chunked.run_production("tmin", stations, years_per_chunk=4,
                                  progress=False) == 2

    f_full = tmp_path / "full" / "tmin_tile00000.h5"
    daily_full = read_var(f_full, "tmin")           # (2922, 24, 24)
    norm_full = read_var(f_full, "tmin_normal")

    pieces = []
    for span in ("2008_2011", "2012_2015"):
        fc = tmp_path / "chunks" / f"chunk_{span}" / "tmin_tile00000.h5"
        pieces.append(read_var(fc, "tmin"))
        norm_c = read_var(fc, "tmin_normal")
        # normals identical across chunks (same stations/params)
        np.testing.assert_allclose(norm_c, norm_full, atol=1e-4)
    daily_chunked = np.concatenate(pieces, axis=0)
    assert daily_chunked.shape == daily_full.shape
    # int16 packing differs per chunk (different value span): allow 2x the
    # coarser quantization step
    finite = np.isfinite(daily_full)
    assert np.array_equal(finite, np.isfinite(daily_chunked))
    q = max(np.ptp(daily_full[finite]), np.ptp(daily_chunked[finite])) / 65500
    assert np.abs(daily_full - daily_chunked)[finite].max() <= 2 * q + 1e-5


def test_chunk_resume_is_per_chunk(tmp_path, setup):
    world, days, rasters, stations = setup
    cfg = _config()
    eng = TileEngine(cfg, rasters, days, tmp_path / "out")
    assert eng.run_production("tmin", stations, years_per_chunk=4,
                              progress=False) == 2
    # wipe one chunk's tile -> only that chunk re-runs
    victim = tmp_path / "out" / "chunk_2012_2015" / "tmin_tile00000.h5"
    victim.unlink()
    eng2 = TileEngine(cfg, rasters, days, tmp_path / "out")
    assert eng2.run_production("tmin", stations, years_per_chunk=4,
                               progress=False) == 1
    assert victim.exists()


def test_chunked_pair_matches_chunked_sequential(tmp_path, setup):
    """run_production_pair: both variables per chunked tile pass must match
    independent chunked runs (within per-run int16 quantization) and reuse
    the same chunk layout/resume structure."""
    import dataclasses

    world, days, rasters, a = setup
    b = dataclasses.replace(
        a, norm=a.norm + 9.0, anoms=(a.anoms * 0.85).astype(np.float32)
    )
    cfg = _config()

    eng_p = TileEngine(cfg, rasters, days, tmp_path / "paired")
    assert eng_p.run_production_pair(
        "tmin", "tmax", a, b, years_per_chunk=4, progress=False
    ) == {"tmin": 2, "tmax": 2}  # 2 chunks x 1 tile each

    eng_s = TileEngine(cfg, rasters, days, tmp_path / "seq")
    assert eng_s.run_production("tmin", a, years_per_chunk=4,
                                progress=False) == 2
    assert eng_s.run_production("tmax", b, years_per_chunk=4,
                                progress=False) == 2

    for var in ("tmin", "tmax"):
        for span in ("2008_2011", "2012_2015"):
            f_p = tmp_path / "paired" / f"chunk_{span}" / f"{var}_tile00000.h5"
            f_s = tmp_path / "seq" / f"chunk_{span}" / f"{var}_tile00000.h5"
            np.testing.assert_allclose(
                np.nan_to_num(read_var(f_p, f"{var}_normal")),
                np.nan_to_num(read_var(f_s, f"{var}_normal")),
                atol=5e-3,
            )
            np.testing.assert_allclose(
                np.nan_to_num(read_var(f_p, var)),
                np.nan_to_num(read_var(f_s, var)),
                atol=5e-3,
            )

    # per-chunk resume works for the paired driver too
    victim = tmp_path / "paired" / "chunk_2008_2011" / "tmax_tile00000.h5"
    victim.unlink()
    eng_p2 = TileEngine(cfg, rasters, days, tmp_path / "paired")
    assert eng_p2.run_production_pair(
        "tmin", "tmax", a, b, years_per_chunk=4, progress=False
    ) == {"tmin": 1, "tmax": 1}  # one tile re-runs (both vars, idempotent)
    assert victim.exists()
