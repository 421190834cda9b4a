import numpy as np
import jax.numpy as jnp

from topotpu.kernels import batched_wls, batched_gwr_gain, ok_solve
from topotpu.kernels.cholesky import assemble_exp_cov
from topotpu.kernels.wls import center_design
from topotpu.oracle import numpy_ref as oracle


def _random_wls(rng, B=16, k=24, p=4):
    X = rng.normal(size=(B, k, p))
    X[..., 0] = 1.0
    beta_true = rng.normal(size=(B, p))
    y = np.einsum("bkp,bp->bk", X, beta_true) + 0.01 * rng.normal(size=(B, k))
    w = rng.uniform(0.1, 1.0, size=(B, k))
    w[:, -3:] = 0.0  # masked tail
    return X, y, w


def test_batched_wls_matches_lstsq(rng):
    X, y, w = _random_wls(rng)
    beta = np.asarray(batched_wls(jnp.array(X), jnp.array(y), jnp.array(w)))
    for b in range(X.shape[0]):
        want = oracle.wls_lstsq(X[b], y[b], w[b])
        np.testing.assert_allclose(beta[b], want, rtol=5e-3, atol=5e-3)


def test_gwr_gain_reproduces_prediction(rng):
    X, y, w = _random_wls(rng)
    x0 = rng.normal(size=(X.shape[0], X.shape[2]))
    g = np.asarray(
        batched_gwr_gain(jnp.array(X), jnp.array(w), jnp.array(x0))
    )
    beta = np.asarray(batched_wls(jnp.array(X), jnp.array(y), jnp.array(w)))
    pred_beta = np.einsum("bp,bp->b", x0, beta)
    pred_gain = np.einsum("bk,bk->b", g, y)
    np.testing.assert_allclose(pred_gain, pred_beta, rtol=1e-3, atol=1e-3)
    # masked stations carry zero gain
    assert np.all(g[:, -3:] == 0.0)


def test_gwr_gain_sums_to_one_with_intercept(rng):
    X, _, w = _random_wls(rng)
    B, k, p = X.shape
    x0 = np.zeros((B, p))
    x0[:, 0] = 1.0
    # center covariates at x0 = e0 so constants must be reproduced exactly
    g = np.asarray(batched_gwr_gain(jnp.array(X), jnp.array(w), jnp.array(x0)))
    np.testing.assert_allclose(g.sum(-1), 1.0, atol=2e-3)


def test_center_design_prediction_equivalence(rng):
    """Centered/scaled design must give the same prediction as raw design."""
    B, k, q = 8, 20, 3
    cov = rng.normal(size=(B, k, q)) * np.array([1000.0, 5.0, 0.01]) + np.array(
        [2000.0, 10.0, 0.5]
    )
    cov_pt = rng.normal(size=(B, q)) * np.array([1000.0, 5.0, 0.01]) + np.array(
        [2000.0, 10.0, 0.5]
    )
    y = (
        0.002 * cov[..., 0]
        + 0.3 * cov[..., 1]
        - 2.0 * cov[..., 2]
        + 5.0
        + 0.01 * rng.normal(size=(B, k))
    )
    w = rng.uniform(0.2, 1.0, size=(B, k))
    X, x0, _ = center_design(jnp.array(cov), jnp.array(cov_pt), jnp.array(w))
    beta = batched_wls(X, jnp.array(y), jnp.array(w))
    pred = np.asarray(jnp.einsum("bp,bp->b", x0, beta))
    for b in range(B):
        want = oracle.gwr_point(cov[b], cov_pt[b], w[b], y[b])
        np.testing.assert_allclose(pred[b], want, rtol=1e-3, atol=1e-3)


def _random_kriging_setup(rng, B=12, k=16, masked=3):
    lon = rng.uniform(-104, -102, size=(B, k))
    lat = rng.uniform(39, 41, size=(B, k))
    dist_pair = oracle.haversine_km(
        lon[..., :, None], lat[..., :, None], lon[..., None, :], lat[..., None, :]
    )
    # a real query point per batch element so the metric space is consistent
    # (random dist_point can be geometrically impossible -> negative OK var)
    p_lon = rng.uniform(-104, -102, size=(B, 1))
    p_lat = rng.uniform(39, 41, size=(B, 1))
    dist_point = oracle.haversine_km(p_lon, p_lat, lon, lat)
    resid = rng.normal(size=(B, k))
    mask = np.ones((B, k), bool)
    if masked:
        mask[:, -masked:] = False
    nugget = rng.uniform(0.01, 0.1, B)
    psill = rng.uniform(0.5, 2.0, B)
    vrange = rng.uniform(30.0, 150.0, B)
    return dist_pair, dist_point, resid, mask, nugget, psill, vrange


def test_ok_solve_matches_augmented_system(rng):
    dp, d0, resid, mask, nug, ps, rg = _random_kriging_setup(rng)
    C, c0, sill = assemble_exp_cov(
        jnp.array(dp), jnp.array(d0), jnp.array(nug), jnp.array(ps),
        jnp.array(rg), jnp.array(mask), jitter_frac=0.0,
    )
    sol = ok_solve(C, c0, jnp.array(mask), sill)
    pred = np.asarray(jnp.sum(sol.weights * jnp.array(resid), axis=-1))
    var = np.asarray(sol.variance)
    for b in range(dp.shape[0]):
        m = mask[b]
        want_pred, want_var, want_lam = oracle.ok_krige_augmented(
            dp[b][np.ix_(m, m)], d0[b][m], resid[b][m], nug[b], ps[b], rg[b]
        )
        np.testing.assert_allclose(pred[b], want_pred, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(var[b], max(want_var, 0.0), rtol=2e-2, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(sol.weights)[b][m], want_lam, rtol=5e-3, atol=5e-3
        )


def test_masked_station_cannot_perturb_solution(rng):
    """The SURVEY §7 hard part: a masked station must not move mean or sigma."""
    dp, d0, resid, mask, nug, ps, rg = _random_kriging_setup(rng, masked=0)
    mask2 = mask.copy()
    mask2[:, -4:] = False

    def run(dpair, dpoint, msk):
        C, c0, sill = assemble_exp_cov(
            jnp.array(dpair), jnp.array(dpoint), jnp.array(nug),
            jnp.array(ps), jnp.array(rg), jnp.array(msk), jitter_frac=0.0,
        )
        return ok_solve(C, c0, jnp.array(msk), sill)

    s_masked = run(dp, d0, mask2)
    # physically remove the stations by pushing them infinitely far away
    dp_far = dp.copy()
    d0_far = d0.copy()
    d0_far[:, -4:] = 1e7
    dp_far[:, -4:, :] = 1e7
    dp_far[:, :, -4:] = 1e7
    s_removed = run(dp_far, d0_far, mask2)
    np.testing.assert_allclose(
        np.asarray(s_masked.weights), np.asarray(s_removed.weights), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_masked.variance), np.asarray(s_removed.variance), atol=1e-5
    )
    assert np.all(np.asarray(s_masked.weights)[:, -4:] == 0.0)


def test_ok_weights_sum_to_one(rng):
    dp, d0, _, mask, nug, ps, rg = _random_kriging_setup(rng)
    C, c0, sill = assemble_exp_cov(
        jnp.array(dp), jnp.array(d0), jnp.array(nug), jnp.array(ps),
        jnp.array(rg), jnp.array(mask),
    )
    sol = ok_solve(C, c0, jnp.array(mask), sill)
    np.testing.assert_allclose(np.asarray(sol.weights).sum(-1), 1.0, atol=1e-4)


def test_f32_survives_ill_conditioned_variogram(rng):
    """Stress: nugget ~ 0 and range >> window makes C nearly singular
    (all correlations ~1). The proportional jitter must keep the f32 solve
    within tolerance of the f64 oracle run with the SAME jitter."""
    dp, d0, resid, mask, _, _, _ = _random_kriging_setup(rng, B=8, k=16, masked=0)
    B = dp.shape[0]
    nug = np.full(B, 1e-6)
    ps = np.full(B, 1.0)
    rg = np.full(B, 500.0)  # >> the ~60 km window
    jit = 1e-5
    C, c0, sill = assemble_exp_cov(
        jnp.array(dp, jnp.float32), jnp.array(d0, jnp.float32),
        jnp.array(nug, jnp.float32), jnp.array(ps, jnp.float32),
        jnp.array(rg, jnp.float32), jnp.array(mask), jitter_frac=jit,
    )
    sol = ok_solve(C, c0, jnp.array(mask), sill)
    pred = np.asarray(jnp.sum(sol.weights * jnp.array(resid, jnp.float32), -1))
    for b in range(B):
        want_pred, want_var, _ = oracle.ok_krige_augmented(
            dp[b], d0[b], resid[b], nug[b], ps[b], rg[b], jitter_frac=jit
        )
        # near-interpolation regime: predictions stay physical and close
        np.testing.assert_allclose(pred[b], want_pred, atol=0.05)
        np.testing.assert_allclose(
            float(sol.variance[b]), max(want_var, 0.0), atol=0.01
        )
    assert np.isfinite(np.asarray(sol.weights)).all()


def test_too_few_neighbors_flagged(rng):
    dp, d0, _, mask, nug, ps, rg = _random_kriging_setup(rng, B=4, k=8, masked=6)
    C, c0, sill = assemble_exp_cov(
        jnp.array(dp), jnp.array(d0), jnp.array(nug), jnp.array(ps),
        jnp.array(rg), jnp.array(mask),
    )
    sol = ok_solve(C, c0, jnp.array(mask), sill, min_neighbors=3)
    assert not np.any(np.asarray(sol.ok))
