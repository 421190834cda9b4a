"""Fused Pallas kriging kernel vs the jnp reference path (bit-level parity
up to f32 reassociation). Runs in interpreter mode on CPU; the same kernel
compiles natively on TPU (exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp

from topotpu.kernels.cholesky import assemble_exp_cov, ok_solve
from topotpu.kernels.pallas_krig import ok_solve_fused
from topotpu.oracle.numpy_ref import haversine_km


def _setup(rng, B=256, k=16, masked=3):
    lon = rng.uniform(-104, -102, (B, k))
    lat = rng.uniform(39, 41, (B, k))
    dp = haversine_km(
        lon[:, :, None], lat[:, :, None], lon[:, None, :], lat[:, None, :]
    ).astype(np.float32)
    for b in range(B):
        np.fill_diagonal(dp[b], 0.0)
    p_lon = rng.uniform(-104, -102, (B, 1))
    p_lat = rng.uniform(39, 41, (B, 1))
    d0 = haversine_km(p_lon, p_lat, lon, lat).astype(np.float32)
    mask = np.ones((B, k), bool)
    if masked:
        mask[:, -masked:] = False
    nug = rng.uniform(0.01, 0.1, B).astype(np.float32)
    ps = rng.uniform(0.5, 2.0, B).astype(np.float32)
    rg = rng.uniform(30, 150, B).astype(np.float32)
    return dp, d0, mask, nug, ps, rg


def test_fused_matches_jnp_path(rng):
    dp, d0, mask, nug, ps, rg = _setup(rng)
    C, c0, sill = assemble_exp_cov(
        jnp.asarray(dp), jnp.asarray(d0), jnp.asarray(nug),
        jnp.asarray(ps), jnp.asarray(rg), jnp.asarray(mask),
        jitter_frac=1e-5,
    )
    ref = ok_solve(C, c0, jnp.asarray(mask), sill, min_neighbors=3)

    w, var, ok = ok_solve_fused(
        jnp.asarray(dp.transpose(1, 2, 0)),
        jnp.asarray(d0.T),
        jnp.asarray(mask.T.astype(np.float32)),
        jnp.asarray(nug), jnp.asarray(ps), jnp.asarray(rg),
        jitter_frac=1e-5, min_neighbors=3, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(w).T, np.asarray(ref.weights), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(ref.variance), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref.ok))
    # masked rows carry exactly zero weight
    assert np.all(np.asarray(w).T[~mask] == 0.0)


def test_fused_flags_underpopulated(rng):
    dp, d0, mask, nug, ps, rg = _setup(rng, B=128, k=8, masked=6)
    w, var, ok = ok_solve_fused(
        jnp.asarray(dp.transpose(1, 2, 0)),
        jnp.asarray(d0.T),
        jnp.asarray(mask.T.astype(np.float32)),
        jnp.asarray(nug), jnp.asarray(ps), jnp.asarray(rg),
        min_neighbors=3, interpret=True,
    )
    assert not np.asarray(ok).any()


def test_fused_k64_looped_matches_jnp_path(rng):
    """k=64 goes through the fori_loop (LT-transposed) factorization — the
    round-2 fix for KNOWN_GAPS r1 #7 (unrolled compiles melted past k=48).
    Same parity bar as the unrolled path."""
    dp, d0, mask, nug, ps, rg = _setup(rng, B=128, k=64, masked=5)
    C, c0, sill = assemble_exp_cov(
        jnp.asarray(dp), jnp.asarray(d0), jnp.asarray(nug),
        jnp.asarray(ps), jnp.asarray(rg), jnp.asarray(mask),
        jitter_frac=1e-5,
    )
    ref = ok_solve(C, c0, jnp.asarray(mask), sill, min_neighbors=3)

    w, var, ok = ok_solve_fused(
        jnp.asarray(dp.transpose(1, 2, 0)),
        jnp.asarray(d0.T),
        jnp.asarray(mask.T.astype(np.float32)),
        jnp.asarray(nug), jnp.asarray(ps), jnp.asarray(rg),
        jitter_frac=1e-5, min_neighbors=3, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(w).T, np.asarray(ref.weights), rtol=2e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(ref.variance), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref.ok))
    assert np.all(np.asarray(w).T[~mask] == 0.0)
