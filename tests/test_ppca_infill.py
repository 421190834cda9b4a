"""BASELINE config #3: PPCA infill of a daily station network with 20%
missing obs — imputation must beat climatology by a wide margin and EM must
converge."""

import numpy as np
import jax.numpy as jnp

from topotpu.core.config import PPCAParams
from topotpu.core.dates import get_days_metadata
from topotpu.infill import infill_network, select_predictors
from topotpu.io.synthetic import make_world
from topotpu.stats.ppca import ppca_impute


def _network(rng, n_stations=40, ndays=1095):
    world = make_world(rng, nrows=30, ncols=30, n_stations=n_stations, ndays=ndays)
    days = get_days_metadata("2013-01-01", "2015-12-31")
    assert days.ndays == ndays
    truth = (
        world.stn_norm[np.arange(n_stations)[:, None], days.month_idx[None, :]]
        + world.stn_anoms
    ).astype(np.float32)
    return world, days, truth


def test_ppca_impute_beats_climatology(rng):
    world, days, truth = _network(rng)
    S, T = truth.shape
    miss = rng.uniform(size=(S, T)) < 0.2
    # plus one long contiguous outage per station (the realistic case)
    for s in range(S):
        start = rng.integers(0, T - 120)
        miss[s, start : start + 90] = True
    obs = np.where(miss, np.nan, truth)

    res = infill_network(obs, days.month_idx, PPCAParams(n_components=8, n_neighbors=12))

    # imputation error on held-out entries
    err = np.abs(res.filled - truth)[miss]
    mae = err.mean()

    # climatology baseline: observed station-month mean
    clim = np.zeros_like(truth)
    for m in range(12):
        sel = days.month_idx == m
        with np.errstate(invalid="ignore"):
            mu = np.nanmean(obs[:, sel], axis=1)
        clim[:, sel] = mu[:, None]
    mae_clim = np.abs(clim - truth)[miss].mean()

    assert mae < 0.6 * mae_clim, f"PPCA MAE {mae:.3f} vs climatology {mae_clim:.3f}"
    assert np.isfinite(res.filled).all()
    # observed entries must be preserved exactly
    np.testing.assert_array_equal(res.filled[~miss], truth[~miss])


def test_infill_monthly_normals_accuracy(rng):
    world, days, truth = _network(rng)
    S, T = truth.shape
    miss = rng.uniform(size=(S, T)) < 0.2
    obs = np.where(miss, np.nan, truth)
    res = infill_network(obs, days.month_idx, PPCAParams(n_components=8, n_neighbors=12))
    true_norm = np.stack(
        [truth[:, days.month_idx == m].mean(axis=1) for m in range(12)], axis=1
    )
    mae = np.abs(res.norms - true_norm).mean()
    assert mae < 0.15, f"normals from infilled series off by {mae:.3f} C"


def test_select_predictors_prefers_correlated(rng):
    T = 400
    base = rng.normal(size=T)
    obs = np.stack(
        [
            base + 0.1 * rng.normal(size=T),   # 0: target
            base + 0.1 * rng.normal(size=T),   # 1: near-copy (should rank 1st)
            0.5 * base + rng.normal(size=T),   # 2: weakly correlated
            rng.normal(size=T),                # 3: uncorrelated
        ]
    )
    mask = np.ones_like(obs, bool)
    preds = select_predictors(obs, mask, 2)
    assert preds[0, 0] == 1
    assert 3 not in preds[0]


def test_ppca_exact_on_lowrank_noiseless(rng):
    """A rank-2 noiseless matrix with holes must be reconstructed ~exactly."""
    B, T, V, q = 2, 300, 10, 2
    U = rng.normal(size=(B, T, q))
    Wt = rng.normal(size=(B, q, V))
    Y = (U @ Wt).astype(np.float32)
    mask = rng.uniform(size=Y.shape) > 0.25
    res = ppca_impute(jnp.asarray(np.where(mask, Y, 0.0)), jnp.asarray(mask),
                      n_components=q, max_iters=2000, tol=1e-7)
    err = np.abs(np.asarray(res.filled) - Y)[~mask]
    scale = np.abs(Y).mean()
    # impute-EM is alternating projection: linear convergence, so demand a
    # small mean error and a bounded tail rather than exactness
    assert err.mean() < 0.03 * scale, f"mean err {err.mean():.4f} (scale {scale:.2f})"
    assert err.max() < 0.5 * scale, f"max err {err.max():.4f}"
    assert float(np.asarray(res.sigma2).max()) < 0.01


def test_infill_network_batch_composition_invariant(rng):
    """The infill scheduler orders targets by difficulty and wraps padding,
    so batch composition varies with batch_size — but per-target results
    must not: every op in ppca_impute is elementwise over the batch and the
    per-target freeze stops converged elements, so a target's fixed point
    and iteration count are independent of its batchmates. Pin it bitwise
    (scheduling must be pure scheduling)."""
    world, days, truth = _network(rng, n_stations=20)
    S, T = truth.shape
    miss = rng.uniform(size=(S, T)) < 0.2
    obs = np.where(miss, np.nan, truth)
    params = PPCAParams(n_components=4, n_neighbors=8, max_iters=40)

    one_batch = infill_network(obs, days.month_idx, params, batch_size=S)
    odd_batches = infill_network(obs, days.month_idx, params, batch_size=7)

    np.testing.assert_array_equal(one_batch.filled, odd_batches.filled)
    np.testing.assert_array_equal(one_batch.n_iters, odd_batches.n_iters)
    np.testing.assert_array_equal(one_batch.norms, odd_batches.norms)


def test_ppca_per_target_convergence():
    """Convergence is decided per batch element (the reference decided EM
    convergence per station): a planted hard target must neither inflate
    the easy targets' iteration counts nor hide behind a batch-global
    converged flag — and the easy targets' results must be unchanged by
    the hard target's presence in the batch."""
    rng = np.random.default_rng(3)  # fixed: the easy/hard split is seeded
    B, T, V, q = 2, 400, 10, 2
    z = rng.standard_normal((B, T, q)).astype(np.float32)
    w = rng.standard_normal((B, V, q)).astype(np.float32)
    Y = np.einsum("btq,bvq->btv", z, w) + 0.1 * rng.standard_normal(
        (B, T, V)
    ).astype(np.float32)
    mask = rng.uniform(size=(B, T, V)) > 0.2
    # hard target: pure heavy noise with a worst-case missing pattern —
    # no low-rank structure for EM to lock onto quickly (near-zero-noise
    # low-rank data is NOT easy for EM: the sigma^2->0 limit is stiff,
    # hence the moderate 0.1 noise on the easy targets above)
    Yh = 5.0 * rng.standard_normal((1, T, V)).astype(np.float32)
    mh = rng.uniform(size=(1, T, V)) > 0.6
    tol, max_iters = 1e-4, 60

    easy = ppca_impute(jnp.asarray(Y), jnp.asarray(mask), q,
                       max_iters=max_iters, tol=tol)
    both = ppca_impute(
        jnp.asarray(np.concatenate([Y, Yh])),
        jnp.asarray(np.concatenate([mask, mh])), q,
        max_iters=max_iters, tol=tol,
    )
    # per-target diagnostics: easy targets converge early; the hard one
    # runs to the cap and reports NOT converged
    assert np.asarray(both.converged)[:B].all()
    assert not np.asarray(both.converged)[B]
    assert int(np.asarray(both.n_iters)[B]) == max_iters
    # the hard target must not inflate the others' iteration counts...
    np.testing.assert_array_equal(
        np.asarray(both.n_iters)[:B], np.asarray(easy.n_iters)
    )
    assert (np.asarray(easy.n_iters) < max_iters).all()
    # ...nor perturb their fixed points (element-wise independent EM)
    np.testing.assert_allclose(
        np.asarray(both.filled)[:B], np.asarray(easy.filled),
        rtol=0, atol=1e-5,
    )
