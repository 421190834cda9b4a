"""Edge cases the production pipeline will eventually hit."""

import numpy as np
import jax
import jax.numpy as jnp

from topotpu.core.config import InterpParams
from topotpu.interp.point import interp_tile
from topotpu.io.synthetic import make_world, tile_inputs_from_world
from topotpu.core.dates import get_days_metadata


def _tile(rng, n_cells=64, n_stations=40, k=8):
    world = make_world(rng, nrows=16, ncols=16, n_stations=n_stations, ndays=62)
    days = get_days_metadata("2015-01-01", "2015-12-31")
    rows, cols = np.unravel_index(np.arange(n_cells), (16, 16))
    ti, _ = tile_inputs_from_world(world, days.month_idx[:62], rows, cols)
    return ti, InterpParams(k_neighbors=k)


def test_per_month_validity_variation(rng):
    """The general (non-shared-validity) path: different stations valid in
    different months must change neighborhoods month by month."""
    ti, params = _tile(rng)
    valid = np.ones((40, 12), bool)
    valid[:20, 3] = False   # half the network missing in April
    valid[20:, 9] = False   # the other half missing in October
    ti = ti._replace(stn_valid=jnp.asarray(valid))
    res = interp_tile(ti, params, shared_validity=False)
    assert np.isfinite(np.asarray(res.normal)).all()
    # April and October used disjoint station halves -> normals must differ
    # from a run where everything was valid
    res_all = interp_tile(ti._replace(stn_valid=jnp.ones((40, 12), bool)), params)
    d_apr = np.abs(np.asarray(res.normal[3]) - np.asarray(res_all.normal[3]))
    assert d_apr.max() > 0.01


def test_shared_validity_flag_equivalence(rng):
    """With truly month-invariant validity the fast path must match the
    general path exactly (same selected neighborhoods)."""
    ti, params = _tile(rng)
    r1 = interp_tile(ti, params, shared_validity=False)
    r2 = interp_tile(ti, params, shared_validity=True)
    np.testing.assert_allclose(
        np.asarray(r1.normal), np.asarray(r2.normal), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(r1.ok), np.asarray(r2.ok))


def test_colocated_stations_survive(rng):
    """Duplicate station coordinates make the covariance singular up to the
    nugget/jitter — the solve must stay finite and masked-sane."""
    ti, params = _tile(rng)
    lon = np.asarray(ti.stn_lon).copy()
    lat = np.asarray(ti.stn_lat).copy()
    lon[1] = lon[0]
    lat[1] = lat[0]   # exact co-location
    ti = ti._replace(stn_lon=jnp.asarray(lon), stn_lat=jnp.asarray(lat))
    res = interp_tile(ti, params)
    assert np.isfinite(np.asarray(res.normal)).all()
    assert np.isfinite(np.asarray(res.se)).all()


def test_fused_kernel_other_k_sizes(rng):
    """Kernel must compile/agree for non-default neighborhood sizes."""
    from topotpu.interp.normals import krig_normals
    from tests.test_normals_fused import _gathered_inputs

    # k=64 exercises the uniform-shape factorization variant
    for k in (8, 24, 48, 64):
        args = _gathered_inputs(rng, C=16, k=k)
        ref = krig_normals(**args, use_pallas="off")
        got = krig_normals(**args, use_pallas="on")
        np.testing.assert_allclose(
            np.asarray(got.normal), np.asarray(ref.normal),
            rtol=1e-4, atol=2e-3,
        )
