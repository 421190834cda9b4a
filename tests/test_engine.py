"""BASELINE config #4 in miniature: multi-tile gridded production through the
TileEngine — tiled netCDF out, manifest resume, accuracy vs ground truth."""

import json

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
    rng = np.random.default_rng(21)
    # 48x48 world -> 4 tiles of 24x24; some ocean
    world = make_world(rng, nrows=48, ncols=48, n_stations=120, ndays=365,
                      ocean_frac=0.15)
    days = get_days_metadata("2015-01-01", "2015-12-31")
    rasters = RasterStack.from_world(world)
    nug, ps, rg = world.true_vario
    stations = StationSet(
        lon=world.stn_lon, lat=world.stn_lat, elev=world.stn_elev,
        tdi=world.stn_tdi, lst=world.stn_lst, norm=world.stn_norm,
        vario=np.tile(np.array([nug, ps, rg], np.float32), (world.n_stations, 12, 1)),
        valid=np.ones((world.n_stations, 12), bool),
        anoms=world.stn_anoms.astype(np.float32),
    )
    return world, days, rasters, stations


def _config():
    return TopoConfig(
        tile_rows=24, tile_cols=24,
        interp=InterpParams(k_neighbors=16, max_tile_stations=128),
        mesh=MeshParams(n_devices=8),
    )


def test_engine_end_to_end(tmp_path, setup):
    world, days, rasters, stations = setup
    eng = TileEngine(_config(), rasters, days, tmp_path / "out")
    n = eng.run("tmin", stations, progress=False)
    assert n == 4

    manifest = json.loads((tmp_path / "out" / "manifest.json").read_text())
    assert len(manifest["tiles"]) == 4

    # read back one tile and score against ground truth
    spec = eng.tiling.tile(0)
    f = tmp_path / "out" / "tmin_tile00000.h5"
    normal = read_var(f, "tmin_normal")   # (12, 24, 24)
    se = read_var(f, "tmin_se")
    daily = read_var(f, "tmin")           # (365, 24, 24)

    land = world.landmask[:24, :24]
    assert np.isfinite(normal[:, land]).all()
    assert np.isnan(normal[:, ~land]).all()
    assert np.isfinite(se[:, land]).all()

    rows, cols = np.nonzero(land)
    lon, lat = world.grid.cell_lonlat(rows, cols)
    truth = world.true_normal(
        lon, lat, world.elev[rows, cols], world.tdi[rows, cols],
        world.lst[6, rows, cols], 7,
    )
    mae = np.abs(normal[6][land] - truth).mean()
    assert mae < 0.5, f"July normals MAE {mae:.3f}"

    # daily = normal + anomaly: check a whole-month mean is close to normal
    jan = daily[:31][:, land].mean(axis=0)
    assert np.abs(jan - normal[0][land]).mean() < 1.5


def test_engine_resume_skips_completed(tmp_path, setup):
    world, days, rasters, stations = setup
    out = tmp_path / "out"
    eng = TileEngine(_config(), rasters, days, out)
    assert eng.run("tmin", stations, progress=False) == 4

    # resume: nothing pending
    eng2 = TileEngine(_config(), rasters, days, out)
    assert eng2.run("tmin", stations, progress=False) == 0

    # delete one tile file -> only that tile re-runs
    victim = out / "tmin_tile00001.h5"
    victim.unlink()
    eng3 = TileEngine(_config(), rasters, days, out)
    assert eng3.run("tmin", stations, progress=False) == 1
    assert victim.exists()


def test_engine_monthly_varying_validity(tmp_path, setup):
    """Engine must auto-detect per-month validity and use the general
    (12-selection) compiled variant; results stay covered and sane."""
    world, days, rasters, stations = setup
    import dataclasses

    valid = stations.valid.copy()
    valid[: valid.shape[0] // 3, 6] = False  # a third of stations out in July
    stations2 = dataclasses.replace(stations, valid=valid)
    eng = TileEngine(_config(), rasters, days, tmp_path / "out")
    assert eng.run("tmin", stations2, progress=False) == 4
    f = tmp_path / "out" / "tmin_tile00000.h5"
    normal = read_var(f, "tmin_normal")
    land = world.landmask[:24, :24]
    assert np.isfinite(normal[:, land]).all()
    # July field computed from fewer stations differs from a full-network run
    eng2 = TileEngine(_config(), rasters, days, tmp_path / "out_full")
    eng2.run("tmin", stations, progress=False)
    n_full = read_var(tmp_path / "out_full" / "tmin_tile00000.h5", "tmin_normal")
    assert np.abs(np.nan_to_num(normal[6] - n_full[6])).max() > 1e-4
    # January untouched — up to int16 pack granularity (normals are packed
    # with a per-run global scale, so two runs quantize on different grids;
    # step = range/65500 ~ 1e-3 C here, far below the 0.05 C parity bar)
    np.testing.assert_allclose(
        np.nan_to_num(normal[0]), np.nan_to_num(n_full[0]), atol=5e-3
    )


def test_asin_window_guard(tmp_path, setup):
    """The fused kernel's Taylor-asin is only exact below ~2500 km pair
    distance; an engine whose tile+margin could exceed it must refuse
    rather than silently degrade (documented validity -> checked invariant)."""
    world, days, rasters, stations = setup
    with pytest.raises(ValueError, match="Taylor-asin"):
        TileEngine(_config(), rasters, days, tmp_path / "out",
                   margin_km=2000.0)
    # and the jnp (exact asin) path is exempt
    import dataclasses

    cfg = _config()
    cfg = dataclasses.replace(
        cfg, interp=dataclasses.replace(cfg.interp, use_pallas="off"))
    TileEngine(cfg, rasters, days, tmp_path / "out2", margin_km=2000.0)


def test_engine_separate_variables(tmp_path, setup):
    world, days, rasters, stations = setup
    out = tmp_path / "out"
    eng = TileEngine(_config(), rasters, days, out)
    assert eng.run("tmin", stations, progress=False) == 4
    # a second variable is independent work
    assert eng.run("tmax", stations, progress=False) == 4
    assert (out / "tmax_tile00003.h5").exists()


# ---------------------------------------------------------- stall watchdog


def _bare_engine(stall_s: int) -> TileEngine:
    """A pipeline-only engine (no world/files): _pipelined touches just
    PIPELINE_DEPTH (class attr), config.stall_timeout_s, and _on_stall."""
    import dataclasses

    eng = TileEngine.__new__(TileEngine)
    eng.config = dataclasses.replace(TopoConfig(), stall_timeout_s=stall_s)
    return eng


class _Status:
    def tick(self):
        pass


def test_stall_watchdog_fires_on_wedged_pipeline():
    """The lost-RPC tunnel stall blocks a pipeline stage FOREVER without an
    exception (failure detection, SURVEY §5): the watchdog must notice zero
    progress past stall_timeout_s and invoke _on_stall exactly once (the
    production action exits 75; tests inject an unblocking recorder)."""
    import threading
    import time as _t

    eng = _bare_engine(stall_s=1)
    unblock = threading.Event()
    fired: list[float] = []

    def on_stall(idle):
        fired.append(idle)
        unblock.set()  # release the wedge so the test run drains

    eng._on_stall = on_stall

    def step(spec):
        return spec, {"v": np.zeros(2)}

    def write(spec, host):
        if not fired:
            assert unblock.wait(30), "watchdog never fired"

    t0 = _t.monotonic()
    n = eng._pipelined([0], step, write, _Status())
    assert n == 1
    assert len(fired) == 1
    # fired only after a genuine idle window past the timeout
    assert fired[0] >= 1.0
    assert _t.monotonic() - t0 >= 1.0


def test_stall_watchdog_quiet_while_progressing():
    """Slow-but-moving pipelines must never trip the watchdog: total wall
    exceeds stall_timeout_s several times over, but every tile completes
    within it."""
    import time as _t

    eng = _bare_engine(stall_s=2)
    fired: list[float] = []
    eng._on_stall = lambda idle: fired.append(idle)

    def step(spec):
        return spec, {"v": np.zeros(2)}

    def write(spec, host):
        _t.sleep(0.5)

    n = eng._pipelined(list(range(10)), step, write, _Status())
    assert n == 10 and not fired  # 5 s of wall, zero false positives


# ------------------------------------------------- station-pool cap guard


def test_pool_cap_dropping_in_tile_stations_warns(tmp_path, setup, capsys):
    """max_tile_stations keeps the nearest-to-tile-CENTER stations, so a cap
    below a tile's own station count strips edge cells of their local
    neighborhoods — silent accuracy loss (measured 0.22 -> 0.94 C normals
    MAE on a 10k-station probe grid). The engine must count and WARN when
    the cap drops stations located inside a tile; a cap that only sheds
    margin stations stays quiet."""
    import dataclasses

    world, days, rasters, stations = setup
    # one tile spanning the whole 48x48 world, cap far below the 120
    # stations that live inside it
    cfg = dataclasses.replace(
        _config(), tile_rows=48, tile_cols=48,
        interp=InterpParams(k_neighbors=16, max_tile_stations=32),
    )
    eng = TileEngine(cfg, rasters, days, tmp_path / "out")
    assert eng.run("tmin", stations, progress=False) == 1
    assert eng.pool_in_tile_dropped > 0
    assert "drops" in capsys.readouterr().out

    # ample cap: nothing dropped, no warning
    eng2 = TileEngine(_config(), rasters, days, tmp_path / "out2")
    assert eng2.run("tmin", stations, progress=False) == 4
    assert eng2.pool_in_tile_dropped == 0
    assert "WARNING" not in capsys.readouterr().out
