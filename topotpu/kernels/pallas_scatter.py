"""Fused neighborhood-scatter + day matmul kernel.

Parity target: the daily-anomaly application step — the reference's hot
loop #3 (SURVEY §3.1) reduced in interp/anoms.py to "scatter per-cell gain
rows into a dense (cells x stations) matrix, then one matmul per month".

Why a kernel: both XLA variants move big tensors through HBM — the
scatter-add writes a (C, S) matrix (134 MB per 65k-cell month) and the
gather variant reads a (C, k, dpm) tensor (260 MB). But the station-day
matrix Y is tiny (512 x 31 f32 = 63 KB): it fits in VMEM whole. So per
512-cell block this kernel

  1. builds the dense gain matrix G^T (S, cells) in VMEM by k iota-compare
     accumulation passes (a vectorized scatter: no dynamic indexing),
  2. contracts it against the VMEM-resident Y on the MXU,

and the only HBM traffic is idx/gains in (8 MB) and anomalies out (8 MB) —
a ~30x traffic reduction over the gather path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELLS_BLOCK = 512

# Per-call cap on Y's day-column count. The kernel's scoped VMEM grows
# ~6 KB per column (Y block + double-buffered out): a 2976-column Y (the
# paired two-variable 4-year-chunk case, 2 x 12 x 124 day slots) measured
# 17.31 MB against the 16 MB limit and failed to compile. Above the cap
# the public entry splits Y column-wise and runs the kernel per chunk:
# the in-VMEM scatter is recomputed per chunk, but it is FLOP-trivial
# (k passes over an (S, 512) block) and the extra idx/gains HBM re-reads
# (~8 MB per chunk) stay ~10x below the gather alternative this kernel
# replaces, so chunking preserves the kernel's entire advantage.
MAX_Y_COLS = 1280


def _scatter_matmul_kernel(idx_ref, gains_ref, m_ref, y_ref, out_ref, Gt,
                           *, k: int, S: int, cells: int):
    # vectorized scatter: G^T[s, c] = sum_j [s == idx[j, c]] * gains[j, c]
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, cells), 0)
    acc = jnp.zeros((S, cells), jnp.float32)
    for j in range(k):
        row = idx_ref[j, :]                       # (cells,) int32
        g = gains_ref[j, :] * m_ref[j, :]         # (cells,)
        hit = (sub == row[None, :]).astype(jnp.float32)
        acc = acc + hit * g[None, :]
    Gt[:, :] = acc
    # (cells, dpm) = G^T^T @ Y on the MXU, contracting the station axis
    # HIGHEST: default MXU bf16 inputs cost ~0.04 C on +-10 C anomalies,
    # violating the 0.05 C parity budget; this matmul is FLOP-trivial.
    out_ref[:, :] = jax.lax.dot_general(
        Gt[:, :], y_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def scatter_daily_matmul(
    idx_t: jnp.ndarray,    # (k, C) int32 neighborhood indices
    gains_t: jnp.ndarray,  # (k, C) f32 GWR gains
    mask_t: jnp.ndarray,   # (k, C) f32 0/1
    Y: jnp.ndarray,        # (S, dpm) station day matrix
    interpret: bool = False,
) -> jnp.ndarray:
    """(C, dpm) daily anomalies. C must be a multiple of 512; day axes
    wider than MAX_Y_COLS are processed in column chunks (see above)."""
    S, dpm = Y.shape
    if dpm > MAX_Y_COLS:
        n = -(-dpm // MAX_Y_COLS)
        w = -(-dpm // n)  # balanced chunk widths
        # zero-pad the day axis to n*w so EVERY chunk launches the SAME
        # kernel shape: relay-side TPU compiles are per-shape and not
        # persisted across processes, so a narrower final chunk would pay
        # a whole extra remote Mosaic compile for zero benefit. The padded
        # columns are sliced back off here (and downstream slot_of_day
        # gathers never select them).
        if n * w != dpm:
            Y = jnp.pad(Y, ((0, 0), (0, n * w - dpm)))
        return jnp.concatenate(
            [
                _scatter_daily_matmul_one(
                    idx_t, gains_t, mask_t, Y[:, c0 : c0 + w], interpret
                )
                for c0 in range(0, n * w, w)
            ],
            axis=1,
        )[:, :dpm]
    return _scatter_daily_matmul_one(idx_t, gains_t, mask_t, Y, interpret)


def _scatter_daily_matmul_one(idx_t, gains_t, mask_t, Y, interpret=False):
    k, C = idx_t.shape
    S, dpm = Y.shape
    assert C % CELLS_BLOCK == 0, f"cell batch {C} not a multiple of {CELLS_BLOCK}"
    grid = (C // CELLS_BLOCK,)
    kern = functools.partial(
        _scatter_matmul_kernel, k=k, S=S, cells=CELLS_BLOCK
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, CELLS_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, CELLS_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, CELLS_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, dpm), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CELLS_BLOCK, dpm), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, dpm), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, CELLS_BLOCK), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(C * S * (3 * k / 1 + 2 * dpm)),
            bytes_accessed=int(C * (3 * k + dpm) * 4 + S * dpm * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        idx_t.astype(jnp.int32),
        gains_t.astype(jnp.float32),
        mask_t.astype(jnp.float32),
        Y.astype(jnp.float32),
    )
