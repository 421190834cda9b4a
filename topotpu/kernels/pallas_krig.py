"""Fused ordinary-kriging Pallas kernel.

Parity target: the kriging system assembly + solve that R gstat performs per
cell in the reference (``twx/interp/interp_tair.py::KrigTair``, SURVEY.md
§2.12) — here one TPU kernel per 128-cell lane batch.

Why a kernel: XLA lowers ``jnp.linalg.cholesky`` on (B, 32, 32) batches to a
blocked While-loop routine that dominates the interp step (~60% of bench
time). The kriging system is tiny (k<=64) but there are millions of them; the
right layout is **batch-in-lanes**: hold 128 independent systems in the lane
dimension and unroll the k-step Cholesky/solves as straight-line VPU code —
every instruction processes 128 systems, there is no inner control flow, and
the covariance matrix never exists in HBM (assembly is fused in VMEM).

Layout: (k, k, 128) blocks — sublanes = matrix rows, lanes = batch. All math
mirrors kernels/cholesky.py exactly (same masking, same SK->OK reduction);
tests bit-compare the two paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 512  # lanes per kernel block: the unrolled factorization is
# issue-bound (≈160 small sequential steps), so each step should touch as
# many systems as VMEM allows — 512 lanes ≈ 4 vreg-rows per op. Measured
# 55 ms → 23 ms for 65k systems going 128 → 512.
_OUT_EXTRA = 8  # rows after the k weight rows: [var, ok, t, pad...]


EARTH_RADIUS_KM = 6371.0087714


def _krig_kernel(dp_ref, d0_ref, m_ref, nug_ref, ps_ref, rg_ref, out_ref,
                 Cs, y0, y1, *, k: int, lanes: int, jitter_frac: float,
                 min_neighbors: int):
    """Entry point taking precomputed pair distances (k, k, lanes)."""
    _solve_body(dp_ref[:, :, :], d0_ref, m_ref, nug_ref, ps_ref, rg_ref,
                out_ref, Cs, y0, y1, k=k, lanes=lanes,
                jitter_frac=jitter_frac, min_neighbors=min_neighbors)


def _krig_kernel_xyz(xyz_ref, d0_ref, m_ref, nug_ref, ps_ref, rg_ref, out_ref,
                     Cs, y0, y1, *, k: int, lanes: int, jitter_frac: float,
                     min_neighbors: int):
    """Entry point computing pair distances in-kernel from unit-sphere xyz.

    xyz_ref is (3k, lanes): rows [0:k) = x, [k:2k) = y, [2k:3k) = z. Moving
    the distance computation into the kernel replaces the (k, k, B) HBM
    tensor (268 MB per 65k-cell month at k=32) with a (3k, B) one (25 MB) —
    the XLA-side construction of the big tensor had become the bottleneck
    after the solve was fused.
    """
    d2 = None
    for c in range(3):
        v = xyz_ref[c * k : (c + 1) * k, :]            # (k, lanes)
        diff = v[:, None, :] - v[None, :, :]           # (k, k, lanes)
        d2 = diff * diff if d2 is None else d2 + diff * diff
    half = jnp.clip(0.5 * jnp.sqrt(d2), 0.0, 1.0)
    # asin has no Pallas TPU lowering; odd Taylor series is exact to <1e-6
    # relative for half-chord < 0.2 (~2500 km window). Beyond that the
    # covariance exp(-d/rng) is ~0, so residual series error is inert.
    h2 = half * half
    asin_h = half * (
        1.0 + h2 * (1.0 / 6.0 + h2 * (3.0 / 40.0 + h2 * (15.0 / 336.0)))
    )
    dp = 2.0 * EARTH_RADIUS_KM * asin_h
    _solve_body(dp, d0_ref, m_ref, nug_ref, ps_ref, rg_ref,
                out_ref, Cs, y0, y1, k=k, lanes=lanes,
                jitter_frac=jitter_frac, min_neighbors=min_neighbors)


def _solve_body(dp, d0_ref, m_ref, nug_ref, ps_ref, rg_ref, out_ref,
                Cs, y0, y1, *, k: int, lanes: int, jitter_frac: float,
                min_neighbors: int):
    nug = nug_ref[0, :]                      # (lanes,)
    ps = ps_ref[0, :]
    rg = jnp.maximum(rg_ref[0, :], 1e-3)
    m = m_ref[:, :]                          # (k, lanes) 0/1
    sill = nug + ps

    # ---- fused covariance assembly (kernels/cholesky.py::assemble_exp_cov)
    C = ps[None, None, :] * jnp.exp(-dp / rg[None, None, :])
    pair = m[:, None, :] * m[None, :, :]
    C = C * pair
    # 3-D iota (Mosaic cannot reshape 2-D bool vectors to 3-D)
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    eyef = (rows3 == cols3).astype(jnp.float32)        # (k, k, 1)
    diag_add = m * (nug + jitter_frac * sill)[None, :] + (1.0 - m)
    C = C + eyef * diag_add[:, None, :]
    Cs[:, :, :] = C

    c0 = ps[None, :] * jnp.exp(-d0_ref[:, :] / rg[None, :]) * m  # (k, 128)
    y0[:, :] = c0
    y1[:, :] = m

    # ---- in-place right-looking Cholesky, unrolled over k (static) -------
    for j in range(k):
        dj = jnp.sqrt(jnp.maximum(Cs[j, j, :], 1e-20))   # (128,)
        inv = 1.0 / dj
        Cs[j, j, :] = dj
        if j + 1 < k:
            col = Cs[j + 1 :, j, :] * inv[None, :]       # (k-1-j, 128)
            Cs[j + 1 :, j, :] = col
            Cs[j + 1 :, j + 1 :, :] = (
                Cs[j + 1 :, j + 1 :, :] - col[:, None, :] * col[None, :, :]
            )

    # ---- forward substitution L y = rhs (two rhs) -------------------------
    for j in range(k):
        inv = 1.0 / Cs[j, j, :]
        a_j = y0[j, :] * inv
        u_j = y1[j, :] * inv
        y0[j, :] = a_j
        y1[j, :] = u_j
        if j + 1 < k:
            Lcol = Cs[j + 1 :, j, :]
            y0[j + 1 :, :] = y0[j + 1 :, :] - Lcol * a_j[None, :]
            y1[j + 1 :, :] = y1[j + 1 :, :] - Lcol * u_j[None, :]

    # ---- back substitution L^T x = y --------------------------------------
    for j in reversed(range(k)):
        inv = 1.0 / Cs[j, j, :]
        a_j = y0[j, :] * inv
        u_j = y1[j, :] * inv
        y0[j, :] = a_j
        y1[j, :] = u_j
        if j > 0:
            Lrow = Cs[j, :j, :]
            y0[:j, :] = y0[:j, :] - Lrow * a_j[None, :]
            y1[:j, :] = y1[:j, :] - Lrow * u_j[None, :]

    # ---- SK -> OK reduction (kernels/cholesky.py::ok_solve) ---------------
    a = y0[:, :] * m
    u = y1[:, :] * m
    sum_a = jnp.sum(a, axis=0)
    sum_u = jnp.sum(u, axis=0)
    n_valid = jnp.sum(m, axis=0)
    ok = (n_valid >= float(min_neighbors)) & (sum_u > 1e-12)
    t = (1.0 - sum_a) / jnp.where(ok, sum_u, 1.0)
    lam = a + t[None, :] * u
    var = jnp.maximum(sill - jnp.sum(lam * c0, axis=0) + t, 0.0)

    out_ref[0:k, :] = lam
    out_ref[k, :] = var
    out_ref[k + 1, :] = ok.astype(jnp.float32)
    out_ref[k + 2 :, :] = jnp.zeros((_OUT_EXTRA - 2, lanes), jnp.float32)


def _launch(entry, first_arg, first_block_rows3, k, B,
            dist_point_t, mask_t, nugget, psill, rng,
            jitter_frac, min_neighbors, interpret):
    lanes = next((l for l in (LANES, 256, 128) if B % l == 0), None)
    assert lanes, f"batch {B} not a multiple of 128"
    grid = (B // lanes,)
    vec = lambda a: a.reshape(1, B)  # noqa: E731
    kern = functools.partial(
        entry, k=k, lanes=lanes, jitter_frac=jitter_frac,
        min_neighbors=min_neighbors,
    )
    if first_block_rows3 is None:  # 3-D (k, k, lanes) pair-distance input
        first_spec = pl.BlockSpec((k, k, lanes), lambda i: (0, 0, i),
                                  memory_space=pltpu.VMEM)
    else:
        first_spec = pl.BlockSpec((first_block_rows3, lanes),
                                  lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            first_spec,
            pl.BlockSpec((k, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k + _OUT_EXTRA, lanes), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k + _OUT_EXTRA, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, k, lanes), jnp.float32),
            pltpu.VMEM((k, lanes), jnp.float32),
            pltpu.VMEM((k, lanes), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(B * (k**3 / 3 + 6 * k**2 + 4 * k)),
            bytes_accessed=int(B * (4 * k + 3) * 4),
            transcendentals=int(B * (k * k + k)),
        ),
        interpret=interpret,
    )(
        first_arg.astype(jnp.float32),
        dist_point_t.astype(jnp.float32),
        mask_t.astype(jnp.float32),
        vec(nugget.astype(jnp.float32)),
        vec(psill.astype(jnp.float32)),
        vec(rng.astype(jnp.float32)),
    )
    return out[:k, :], out[k, :], out[k + 1, :] > 0.5


@functools.partial(
    jax.jit, static_argnames=("jitter_frac", "min_neighbors", "interpret")
)
def ok_solve_fused(
    dist_pair_t: jnp.ndarray,   # (k, k, B) pair distances, batch-last
    dist_point_t: jnp.ndarray,  # (k, B)
    mask_t: jnp.ndarray,        # (k, B) float32 0/1
    nugget: jnp.ndarray,        # (B,)
    psill: jnp.ndarray,         # (B,)
    rng: jnp.ndarray,           # (B,)
    jitter_frac: float = 1e-5,
    min_neighbors: int = 3,
    interpret: bool = False,
):
    """Fused assemble+Cholesky+solve+OK-reduction from pair distances.

    Returns (weights (k, B), variance (B,), ok (B,)). B must be a multiple
    of 128 (the tile engine's cell batches are)."""
    k, _, B = dist_pair_t.shape
    return _launch(_krig_kernel, dist_pair_t, None, k, B,
                   dist_point_t, mask_t, nugget, psill, rng,
                   jitter_frac, min_neighbors, interpret)


@functools.partial(
    jax.jit, static_argnames=("jitter_frac", "min_neighbors", "interpret")
)
def ok_solve_fused_xyz(
    xyz3k: jnp.ndarray,         # (3k, B) unit-sphere coords, c-major rows
    dist_point_t: jnp.ndarray,  # (k, B)
    mask_t: jnp.ndarray,        # (k, B) float32 0/1
    nugget: jnp.ndarray,
    psill: jnp.ndarray,
    rng: jnp.ndarray,
    jitter_frac: float = 1e-5,
    min_neighbors: int = 3,
    interpret: bool = False,
):
    """Same solve, but pair distances are computed in-kernel from xyz —
    ~10x less HBM traffic than shipping the (k, k, B) tensor."""
    k = dist_point_t.shape[0]
    B = xyz3k.shape[1]
    assert xyz3k.shape[0] == 3 * k
    return _launch(_krig_kernel_xyz, xyz3k, 3 * k, k, B,
                   dist_point_t, mask_t, nugget, psill, rng,
                   jitter_frac, min_neighbors, interpret)
