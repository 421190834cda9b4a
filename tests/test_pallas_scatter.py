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


def test_scatter_matmul_wide_day_axis_chunks(rng):
    """Day axes beyond MAX_Y_COLS (the paired 4-year-chunk production
    shape, 2 x 12 x 124 = 2976 columns, which overflowed scoped VMEM
    uncapped) split into column chunks; results must equal the gather
    path across the chunk seams."""
    from topotpu.kernels.pallas_scatter import MAX_Y_COLS

    # D=2977: 3 chunks of ceil(2977/3)=993 with 2977 % 993 != 0, so the
    # final chunk rides the zero-padded tail (one shared kernel shape;
    # padded columns sliced off) — 2976 splits evenly and would leave the
    # pad-and-slice path untested
    C, S, k, D = 512, 128, 8, 2977
    assert D > 2 * MAX_Y_COLS  # >= 3 chunks
    n = -(-D // MAX_Y_COLS)
    w = -(-D // n)
    assert D % w != 0, "fixture must exercise the padded-tail path"
    g = rng.normal(size=(C, k)).astype(np.float32)
    idx = rng.integers(0, S, (C, k)).astype(np.int32)
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
    assert got.shape == (C, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
