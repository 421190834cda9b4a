"""BASELINE config #1 end-to-end slice: synthetic tile, GWR + ordinary
kriging of residuals + daily anomaly GWR, device pipeline vs float64 numpy
oracle, plus ground-truth accuracy (the field was generated from a known GP)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from topotpu.core.config import InterpParams
from topotpu.core.dates import get_days_metadata
from topotpu.interp.point import (
    TileInputs,
    interp_tile,
    month_layout,
    group_days_by_month,
    ungroup_days,
)
from topotpu.io.synthetic import make_world
from topotpu.oracle.pipeline import interp_tile_oracle

K = 16


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    return make_world(rng, nrows=40, ncols=40, n_stations=110, ndays=365)


@pytest.fixture(scope="module")
def days():
    return get_days_metadata("2015-01-01", "2015-12-31")


def _tile_inputs(world, days, cells_rc, dtype=np.float32):
    layout = month_layout(days)
    rows = np.array([r for r, _ in cells_rc])
    cols = np.array([c for _, c in cells_rc])
    lon, lat = world.grid.cell_lonlat(rows, cols)
    S = world.n_stations
    # true variogram params at every station (param build tested separately)
    nug, ps, rg = world.true_vario
    stn_vario = np.tile(
        np.array([nug, ps, rg], dtype=dtype), (S, 12, 1)
    )
    anoms_grouped = group_days_by_month(world.stn_anoms.astype(dtype), layout)
    ti = TileInputs(
        cell_lon=jnp.array(lon, dtype),
        cell_lat=jnp.array(lat, dtype),
        cell_elev=jnp.array(world.elev[rows, cols], dtype),
        cell_tdi=jnp.array(world.tdi[rows, cols], dtype),
        cell_lst=jnp.array(world.lst[:, rows, cols].T, dtype),
        cell_mask=jnp.ones(len(rows), bool),
        stn_lon=jnp.array(world.stn_lon, dtype),
        stn_lat=jnp.array(world.stn_lat, dtype),
        stn_elev=jnp.array(world.stn_elev, dtype),
        stn_tdi=jnp.array(world.stn_tdi, dtype),
        stn_lst=jnp.array(world.stn_lst, dtype),
        stn_norm=jnp.array(world.stn_norm, dtype),
        stn_vario=jnp.array(stn_vario, dtype),
        stn_valid=jnp.ones((S, 12), bool),
        stn_anoms=jnp.array(np.moveaxis(anoms_grouped, 1, 0), dtype),
    )
    return ti, layout, stn_vario


def test_interp_tile_matches_oracle(world, days):
    rng = np.random.default_rng(3)
    cells_rc = [tuple(x) for x in rng.integers(0, 40, size=(12, 2))]
    ti, layout, stn_vario = _tile_inputs(world, days, cells_rc)

    params = InterpParams(k_neighbors=K, min_neighbors=3)
    fn = jax.jit(lambda t: interp_tile(t, params))
    res = fn(ti)

    want = interp_tile_oracle(
        world, cells_rc, K, stn_vario.astype(np.float64), days.month_idx
    )

    got_normal = np.asarray(res.normal)
    got_se = np.asarray(res.se)
    # f32 batched vs f64 loopy: agree to ~0.01 degC
    np.testing.assert_allclose(got_normal, want["normal"], atol=2e-2, rtol=1e-4)
    np.testing.assert_allclose(got_se, want["se"], atol=2e-2, rtol=2e-2)

    daily_cal = ungroup_days(np.asarray(res.daily).transpose(1, 0, 2), layout)
    np.testing.assert_allclose(daily_cal, want["daily"], atol=5e-2, rtol=1e-3)
    assert np.all(np.asarray(res.ok))


def test_interp_recovers_truth_field(world, days):
    """Accuracy vs the known ground truth: kriging the synthetic world must
    beat the trivial predictor by a wide margin and land near the paper-scale
    MAE (SURVEY.md §6 quotes ~0.5-0.8 degC for annual normals)."""
    rng = np.random.default_rng(5)
    cells_rc = [tuple(x) for x in rng.integers(2, 38, size=(40, 2))]
    ti, layout, _ = _tile_inputs(world, days, cells_rc)
    params = InterpParams(k_neighbors=K)
    res = interp_tile(ti, params)

    rows = np.array([r for r, _ in cells_rc])
    cols = np.array([c for _, c in cells_rc])
    lon, lat = world.grid.cell_lonlat(rows, cols)
    maes = []
    for m in range(1, 13):
        truth = world.true_normal(
            lon, lat,
            world.elev[rows, cols], world.tdi[rows, cols],
            world.lst[m - 1, rows, cols], m,
        )
        maes.append(np.mean(np.abs(np.asarray(res.normal[m - 1]) - truth)))
    mae = float(np.mean(maes))
    # station density here (~110 stations / 40x40 cells) supports sub-0.5C
    assert mae < 0.5, f"normals MAE vs truth too high: {mae}"

    # kriging variance should be calibrated within a factor ~2 on average
    se = np.asarray(res.se).mean()
    assert 0.05 < se < 1.5


def test_month_layout_roundtrip(days):
    layout = month_layout(days)
    x = np.arange(days.ndays, dtype=np.float32)[None, :] * 1.7
    g = group_days_by_month(x, layout)
    assert g.shape == (1, 12, layout.dpm)
    back = ungroup_days(g, layout)
    np.testing.assert_array_equal(back, x)
    # all real days land on valid slots
    assert layout.day_valid.sum() == days.ndays
