"""Fused scatter+matmul daily kernel vs the jnp gather path (interpreter
mode on CPU; compiled on TPU via bench/production)."""

import numpy as np
import jax.numpy as jnp

from topotpu.interp.anoms import predict_daily_gathered
from topotpu.kernels.pallas_scatter import scatter_daily_matmul


def test_scatter_matmul_matches_gather(rng):
    C, S, k, D = 1024, 96, 12, 31
    g = rng.normal(size=(C, k)).astype(np.float32)
    # deliberately include duplicate indices within rows (both paths must
    # accumulate duplicates identically)
    idx = rng.integers(0, S, (C, k)).astype(np.int32)
    idx[:, 1] = idx[:, 0]
    mask = rng.uniform(size=(C, k)) > 0.1
    Y = rng.normal(size=(S, D)).astype(np.float32)

    ref = predict_daily_gathered(
        jnp.asarray(g), jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(Y)
    )
    got = scatter_daily_matmul(
        jnp.asarray(idx.T), jnp.asarray(g.T),
        jnp.asarray(mask.T.astype(np.float32)), jnp.asarray(Y),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
