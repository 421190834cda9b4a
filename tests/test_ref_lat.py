"""Non-CONUS domains: the GWR locational-covariate x scale must derive from
the data, not a hard-coded CONUS latitude (round-2 review item: 38.0 was
baked into interp/point.py and interp/xval.py).

Two claims, both at a high-latitude (~63N) domain the config/grid machinery
otherwise fully supports:

  1. the device pipeline still matches the f64 oracle there (the oracle
     derives the same data-mean reference independently);
  2. results are invariant to the *choice* of reference latitude — forcing
     the old 38.0 constant back in changes dailies by < 1e-2 degC, because
     the centered+scaled GWR design cancels any per-column scale up to the
     ridge term. That invariance is WHY deriving the constant is safe to
     ship with no recalibration.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from topotpu.core.config import InterpParams
from topotpu.core.dates import get_days_metadata
from topotpu.interp import point as point_mod
from topotpu.interp.point import interp_tile, ungroup_days
from topotpu.io.synthetic import make_world
from topotpu.oracle.pipeline import interp_tile_oracle

from tests.test_interp_oracle import _tile_inputs

K = 16


@pytest.fixture(scope="module")
def arctic_world():
    rng = np.random.default_rng(21)
    # ~63N: cos(lat)=0.45 vs CONUS's 0.79 — a domain where the old constant
    # mis-scales x-offsets by ~1.75x
    return make_world(rng, nrows=40, ncols=40, n_stations=110, ndays=365,
                      lat_max=63.5, lon_min=-150.0)


@pytest.fixture(scope="module")
def days():
    return get_days_metadata("2015-01-01", "2015-12-31")


def test_high_latitude_matches_oracle(arctic_world, days):
    rng = np.random.default_rng(4)
    cells_rc = [tuple(x) for x in rng.integers(0, 40, size=(10, 2))]
    ti, layout, stn_vario = _tile_inputs(arctic_world, days, cells_rc)
    params = InterpParams(k_neighbors=K, min_neighbors=3)
    res = jax.jit(lambda t: interp_tile(t, params))(ti)
    want = interp_tile_oracle(
        arctic_world, cells_rc, K, stn_vario.astype(np.float64),
        days.month_idx,
    )
    np.testing.assert_allclose(
        np.asarray(res.normal), want["normal"], atol=2e-2, rtol=1e-4
    )
    daily_cal = ungroup_days(np.asarray(res.daily).transpose(1, 0, 2), layout)
    np.testing.assert_allclose(daily_cal, want["daily"], atol=5e-2, rtol=1e-3)
    assert np.all(np.asarray(res.ok))


def test_ref_lat_choice_is_inert(arctic_world, days, monkeypatch):
    """Dailies with the derived (~63N) reference vs the old CONUS 38.0 must
    agree to well under any physical tolerance — demonstrating the removal
    of the constant cannot shift any published product."""
    rng = np.random.default_rng(9)
    cells_rc = [tuple(x) for x in rng.integers(0, 40, size=(16, 2))]
    ti, layout, _ = _tile_inputs(arctic_world, days, cells_rc)
    params = InterpParams(k_neighbors=K, min_neighbors=3)

    res_derived = jax.jit(lambda t: interp_tile(t, params))(ti)

    orig = point_mod._local_xy_km
    monkeypatch.setattr(
        point_mod, "_local_xy_km", lambda lon, lat, ref: orig(lon, lat, 38.0)
    )
    res_const = jax.jit(lambda t: interp_tile(t, params))(ti)

    # normals don't consume x/y at all (trend design is elev/tdi/lst)
    np.testing.assert_array_equal(
        np.asarray(res_derived.normal), np.asarray(res_const.normal)
    )
    d_a = ungroup_days(np.asarray(res_derived.daily).transpose(1, 0, 2), layout)
    d_b = ungroup_days(np.asarray(res_const.daily).transpose(1, 0, 2), layout)
    assert float(np.max(np.abs(d_a - d_b))) < 1e-2
