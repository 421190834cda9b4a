import numpy as np
import jax.numpy as jnp

from topotpu.stats import (
    exp_variogram,
    exp_covariance,
    empirical_variogram,
    fit_exp_variogram,
)
from topotpu.oracle import numpy_ref as oracle


def test_model_identities():
    h = jnp.array([0.0, 1.0, 10.0, 100.0])
    nug, ps, rg = 0.1, 1.0, 30.0
    g = np.asarray(exp_variogram(h, nug, ps, rg))
    c = np.asarray(exp_covariance(h, nug, ps, rg))
    assert g[0] == 0.0
    assert c[0] == nug + ps
    # gamma(h) + C(h) == sill for h > 0
    np.testing.assert_allclose(g[1:] + c[1:], nug + ps, rtol=1e-6)


def test_empirical_matches_loop_oracle(rng):
    k, n_bins = 24, 10
    lon = rng.uniform(-104, -102, k)
    lat = rng.uniform(39, 41, k)
    dist = oracle.haversine_km(lon[:, None], lat[:, None], lon[None, :], lat[None, :])
    vals = rng.normal(size=k)
    mask = np.ones(k, bool)
    mask[-5:] = False

    emp = empirical_variogram(
        jnp.array(dist)[None], jnp.array(vals)[None], jnp.array(mask)[None],
        n_bins=n_bins, max_dist_frac=1.0,
    )
    m = mask
    dvalid = dist[np.ix_(m, m)]
    cutoff = dvalid.max()
    want_g, want_h, want_n = oracle.empirical_variogram_loops(
        dvalid, vals[m], n_bins, cutoff
    )
    np.testing.assert_allclose(np.asarray(emp.cutoff)[0], cutoff, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(emp.npairs)[0], want_n)
    np.testing.assert_allclose(np.asarray(emp.gamma)[0], want_g, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emp.h)[0], want_h, rtol=1e-4, atol=1e-6)


def _synthetic_emp(rng, B, nug, ps, rg, n_bins=15, noise=0.0):
    h = np.linspace(5, 300, n_bins)[None, :].repeat(B, 0)
    gamma = nug[:, None] + ps[:, None] * (1 - np.exp(-h / rg[:, None]))
    gamma = gamma * (1 + noise * rng.normal(size=gamma.shape))
    npairs = np.full((B, n_bins), 50.0)
    from topotpu.stats.variogram import EmpiricalVariogram

    return EmpiricalVariogram(
        gamma=jnp.array(gamma),
        h=jnp.array(h),
        npairs=jnp.array(npairs),
        cutoff=jnp.full((B,), 300.0),
    )


def test_fit_recovers_exact_params(rng):
    B = 8
    nug = rng.uniform(0.0, 0.2, B)
    ps = rng.uniform(0.5, 3.0, B)
    rg = rng.uniform(30, 150, B)
    emp = _synthetic_emp(rng, B, nug, ps, rg)
    fit = fit_exp_variogram(emp, n_iters=80)
    assert np.all(np.asarray(fit.ok))
    np.testing.assert_allclose(np.asarray(fit.nugget), nug, atol=0.02)
    np.testing.assert_allclose(np.asarray(fit.psill), ps, rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(fit.rng), rg, rtol=0.1)


def test_fit_comparable_to_scipy_on_noisy_data(rng):
    B = 6
    nug = rng.uniform(0.0, 0.2, B)
    ps = rng.uniform(0.5, 3.0, B)
    rg = rng.uniform(30, 150, B)
    emp = _synthetic_emp(rng, B, nug, ps, rg, noise=0.05)
    fit = fit_exp_variogram(emp, n_iters=80)
    gamma = np.asarray(emp.gamma)
    h = np.asarray(emp.h)
    npairs = np.asarray(emp.npairs)
    for b in range(B):
        want = oracle.fit_exp_scipy(gamma[b], h[b], npairs[b])

        def wsse(nugv, psv, rgv):
            w = npairs[b] / h[b] ** 2
            w = w / w.sum()
            model = nugv + psv * (1 - np.exp(-h[b] / rgv))
            return np.sum(w * (gamma[b] - model) ** 2)

        got_sse = wsse(
            float(fit.nugget[b]), float(fit.psill[b]), float(fit.rng[b])
        )
        want_sse = wsse(*want)
        # GN solution must be as good as scipy's (within 10% wSSE)
        assert got_sse <= want_sse * 1.1 + 1e-10


def test_fit_flags_insufficient_bins():
    from topotpu.stats.variogram import EmpiricalVariogram

    emp = EmpiricalVariogram(
        gamma=jnp.zeros((2, 15)),
        h=jnp.zeros((2, 15)),
        npairs=jnp.zeros((2, 15)),
        cutoff=jnp.ones((2,)),
    )
    fit = fit_exp_variogram(emp)
    assert not np.any(np.asarray(fit.ok))
