"""f64 end-to-end validation mode (SURVEY §7 "f32 vs f64"): the full tile
path re-run under jax_enable_x64 must agree with the f32 path within the
0.05 C parity bar — including on ill-conditioned variograms (nugget -> 0,
range >> window), the regime KNOWN_GAPS #4 flagged as the f32 risk."""

import numpy as np
import pytest

from topotpu.core.config import InterpParams
from topotpu.core.dates import get_days_metadata
from topotpu.interp.f64check import compare_f32_f64, run_tile_f64
from topotpu.io.synthetic import make_world, tile_inputs_from_world


def _tile(vario_override=None, n_stations=80, seed=9):
    rng = np.random.default_rng(seed)
    world = make_world(rng, nrows=24, ncols=24, n_stations=n_stations, ndays=62)
    days = get_days_metadata("2015-01-01", "2015-12-31")
    rows, cols = np.unravel_index(np.arange(24 * 24), (24, 24))
    ti, _ = tile_inputs_from_world(world, days.month_idx[:62], rows, cols)
    if vario_override is not None:
        v = np.tile(np.asarray(vario_override, np.float32),
                    (ti.stn_vario.shape[0], 12, 1))
        ti = ti._replace(stn_vario=v)
    return ti


def test_f64_path_runs_and_is_finite():
    ti = _tile()
    params = InterpParams(k_neighbors=12)
    res = run_tile_f64(ti, params)
    assert res.normal.dtype == np.float64
    ok = np.asarray(res.ok)
    assert ok.any()
    assert np.isfinite(res.normal[ok]).all()
    assert (res.se[ok] > 0).all()


def test_f32_matches_f64_well_conditioned():
    ti = _tile()
    params = InterpParams(k_neighbors=12)
    r = compare_f32_f64(ti, params)
    assert r["n_compared"] > 5000
    assert r["normal"]["rmse"] < 0.01, r
    assert r["normal"]["max"] < 0.05, r
    assert r["daily"]["rmse"] < 0.02, r
    assert r["ok_flip_rate"] < 0.01, r


def test_f32_matches_f64_ill_conditioned():
    """nugget=0, range 20x the tile window: the covariance matrix is nearly
    singular; f32 survives via the jitter floor and must stay inside the
    parity bar against the f64 end-to-end run."""
    ti = _tile(vario_override=[0.0, 1.2, 2000.0])  # km range >> ~100 km window
    params = InterpParams(k_neighbors=12)
    r = compare_f32_f64(ti, params)
    assert r["n_compared"] > 5000
    assert r["normal"]["rmse"] < 0.05, r
    assert r["daily"]["rmse"] < 0.05, r
    # se is tiny in this regime (everything almost perfectly correlated);
    # absolute agreement still holds
    assert r["se"]["rmse"] < 0.05, r


def test_f64_flags_match_f32_flags():
    """min_neighbors/ok flags are a discrete product: the two precisions
    must agree except on genuine conditioning boundaries."""
    ti = _tile()
    sv = np.array(ti.stn_valid)
    sv[: sv.shape[0] // 2, 5] = False  # halve June's network
    ti = ti._replace(stn_valid=sv)
    r = compare_f32_f64(ti, InterpParams(k_neighbors=12))
    assert r["ok_flip_rate"] < 0.01, r
