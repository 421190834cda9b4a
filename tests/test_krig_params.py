"""BASELINE config #2: moving-window per-station variogram fits must recover
the known GP parameters of the synthetic world (within one-realization
sampling error) and the failure fallback must be sane."""

import numpy as np
import jax.numpy as jnp

from topotpu.core.config import InterpParams, VariogramParams
from topotpu.interp.params import build_krig_params, fill_failed_fits
from topotpu.io.synthetic import make_world


def test_build_krig_params_recovers_gp(rng):
    # dense station set so 48-neighbor windows sample the GP well
    world = make_world(rng, nrows=80, ncols=80, n_stations=300, ndays=30,
                      vario=(0.05, 1.0, 40.0))
    vp = VariogramParams(k_fit_neighbors=48, n_bins=12, gn_iters=60,
                         max_dist_frac=1.0)
    ip = InterpParams()
    res = build_krig_params(
        jnp.asarray(world.stn_lon, jnp.float32),
        jnp.asarray(world.stn_lat, jnp.float32),
        jnp.asarray(world.stn_elev, jnp.float32),
        jnp.asarray(world.stn_tdi, jnp.float32),
        jnp.asarray(world.stn_lst, jnp.float32),
        jnp.asarray(world.stn_norm, jnp.float32),
        jnp.ones((world.n_stations, 12), bool),
        vp, ip,
    )
    vario = np.asarray(res.vario)
    ok = np.asarray(res.ok)
    assert ok.mean() > 0.95, f"only {ok.mean():.2%} fits usable"

    # the synthetic residual field is shared across months; compare medians
    med_sill = np.median((vario[..., 0] + vario[..., 1])[ok])
    med_rng = np.median(vario[..., 2][ok])
    # one-realization window estimates: generous but bounded tolerances
    assert 0.3 < med_sill < 3.0, f"median sill {med_sill}"
    assert 10.0 < med_rng < 160.0, f"median range {med_rng}"
    assert (vario[..., 0][ok] >= 0).all()
    assert (vario[..., 1][ok] > 0).all()


def test_fill_failed_fits():
    vario = np.zeros((4, 12, 3))
    vario[0] = [0.1, 1.0, 50.0]
    vario[1] = [0.2, 2.0, 70.0]
    vario[2] = [9.9, 9.9, 9.9]   # failed garbage
    vario[3] = [0.15, 1.5, 60.0]
    ok = np.ones((4, 12), bool)
    ok[2] = False
    out = fill_failed_fits(vario, ok)
    np.testing.assert_allclose(out[2, :, 0], 0.15)  # median of good
    np.testing.assert_allclose(out[0], vario[0])    # good rows untouched
