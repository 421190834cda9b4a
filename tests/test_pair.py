"""Two-variable (tmin+tmax) paired tile step: the second variable rides the
first's neighborhoods / GWR gains / daily scatter (KNOWN_GAPS r1 #6) and
must reproduce the solo per-variable results; the engine's paired
production path must write the same tiles as two sequential runs."""

import dataclasses
import functools

import numpy as np
import jax
import pytest

from topotpu.core.config import TopoConfig, InterpParams, MeshParams
from topotpu.core.dates import get_days_metadata
from topotpu.dist.engine import TileEngine, StationSet
from topotpu.interp.point import (
    PairTileInputs,
    VarFields,
    interp_tile,
    interp_tile_pair,
)
from topotpu.io.ncdf import read_var
from topotpu.io.synthetic import make_world, tile_inputs_from_world


def _world_inputs():
    rng = np.random.default_rng(11)
    world = make_world(rng, nrows=16, ncols=16, n_stations=40, ndays=62)
    days = get_days_metadata("2015-01-01", "2015-12-31")
    rows, cols = np.unravel_index(np.arange(256), (16, 16))
    ti_a, _ = tile_inputs_from_world(world, days.month_idx[:62], rows, cols)
    # var B: a tmax-like sibling — different normals, anomalies and variogram
    rng2 = np.random.default_rng(12)
    norm_b = np.asarray(ti_a.stn_norm) + 8.0
    vario_b = np.asarray(ti_a.stn_vario) * np.float32(1.3)
    anoms_b = (
        np.asarray(ti_a.stn_anoms) * 0.8
        + rng2.normal(0, 0.1, ti_a.stn_anoms.shape).astype(np.float32)
    )
    return ti_a, norm_b, vario_b, anoms_b


def test_pair_matches_solo_runs():
    ti_a, norm_b, vario_b, anoms_b = _world_inputs()
    ti_b = ti_a._replace(
        stn_norm=norm_b, stn_vario=vario_b, stn_anoms=anoms_b
    )
    params = InterpParams(k_neighbors=8)

    solo_a = jax.jit(functools.partial(interp_tile, params=params))(ti_a)
    solo_b = jax.jit(functools.partial(interp_tile, params=params))(ti_b)
    pair = PairTileInputs(
        geom=ti_a, b=VarFields(norm=norm_b, vario=vario_b, anoms=anoms_b)
    )
    res_a, res_b = jax.jit(
        functools.partial(interp_tile_pair, params=params)
    )(pair)

    for solo, res in ((solo_a, res_a), (solo_b, res_b)):
        np.testing.assert_allclose(
            np.asarray(solo.normal), np.asarray(res.normal), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(solo.se), np.asarray(res.se), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(solo.daily), np.asarray(res.daily), atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(solo.ok), np.asarray(res.ok)
        )


@pytest.fixture(scope="module")
def engine_setup():
    rng = np.random.default_rng(21)
    world = make_world(
        rng, nrows=48, ncols=48, n_stations=120, ndays=365, ocean_frac=0.15
    )
    days = get_days_metadata("2015-01-01", "2015-12-31")
    from topotpu.io.rasters import RasterStack

    rasters = RasterStack.from_world(world)
    nug, ps, rg = world.true_vario
    a = StationSet(
        lon=world.stn_lon, lat=world.stn_lat, elev=world.stn_elev,
        tdi=world.stn_tdi, lst=world.stn_lst, norm=world.stn_norm,
        vario=np.tile(
            np.array([nug, ps, rg], np.float32), (world.n_stations, 12, 1)
        ),
        valid=np.ones((world.n_stations, 12), bool),
        anoms=world.stn_anoms.astype(np.float32),
    )
    b = dataclasses.replace(
        a, norm=a.norm + 9.0, anoms=(a.anoms * 0.85).astype(np.float32)
    )
    return world, days, rasters, a, b


def _config():
    return TopoConfig(
        tile_rows=24, tile_cols=24,
        interp=InterpParams(k_neighbors=16, max_tile_stations=128),
        mesh=MeshParams(n_devices=8),
    )


def test_engine_run_pair_matches_sequential(tmp_path, engine_setup):
    world, days, rasters, a, b = engine_setup

    eng_p = TileEngine(_config(), rasters, days, tmp_path / "paired")
    assert eng_p.run_pair("tmin", "tmax", a, b, progress=False) == {"tmin": 4, "tmax": 4}

    eng_s = TileEngine(_config(), rasters, days, tmp_path / "seq")
    assert eng_s.run("tmin", a, progress=False) == 4
    assert eng_s.run("tmax", b, progress=False) == 4

    for var in ("tmin", "tmax"):
        for tile in range(4):
            f_p = tmp_path / "paired" / f"{var}_tile{tile:05d}.h5"
            f_s = tmp_path / "seq" / f"{var}_tile{tile:05d}.h5"
            n_p = read_var(f_p, f"{var}_normal")
            n_s = read_var(f_s, f"{var}_normal")
            # identical math, independent int16 quantization grids
            np.testing.assert_allclose(
                np.nan_to_num(n_p), np.nan_to_num(n_s), atol=5e-3
            )
            d_p = read_var(f_p, var)
            d_s = read_var(f_s, var)
            np.testing.assert_allclose(
                np.nan_to_num(d_p), np.nan_to_num(d_s), atol=5e-3
            )

    # tmax really is var B's field, not a copy of tmin's
    n_tmin = read_var(tmp_path / "paired" / "tmin_tile00000.h5", "tmin_normal")
    n_tmax = read_var(tmp_path / "paired" / "tmax_tile00000.h5", "tmax_normal")
    assert np.nanmean(n_tmax - n_tmin) > 8.0


def test_engine_run_pair_resume(tmp_path, engine_setup):
    world, days, rasters, a, b = engine_setup
    out = tmp_path / "out"
    eng = TileEngine(_config(), rasters, days, out)
    assert eng.run_pair("tmin", "tmax", a, b, progress=False) == {"tmin": 4, "tmax": 4}
    # fully done: nothing pending
    eng2 = TileEngine(_config(), rasters, days, out)
    assert eng2.run_pair("tmin", "tmax", a, b, progress=False) == {"tmin": 0, "tmax": 0}
    # one variable's tile missing -> that tile re-runs (both vars, idempotent)
    (out / "tmax_tile00002.h5").unlink()
    eng3 = TileEngine(_config(), rasters, days, out)
    assert eng3.run_pair("tmin", "tmax", a, b, progress=False) == {"tmin": 1, "tmax": 1}
    assert (out / "tmax_tile00002.h5").exists()


def test_engine_run_pair_falls_back_on_mismatched_networks(
    tmp_path, engine_setup
):
    world, days, rasters, a, b = engine_setup
    b2 = dataclasses.replace(b, lon=b.lon + 0.01)  # different geometry
    eng = TileEngine(_config(), rasters, days, tmp_path / "out")
    # falls back to two sequential runs; both variables still produced
    assert eng.run_pair("tmin", "tmax", a, b2, progress=False) == {"tmin": 4, "tmax": 4}
    assert (tmp_path / "out" / "tmin_tile00003.h5").exists()
    assert (tmp_path / "out" / "tmax_tile00003.h5").exists()
