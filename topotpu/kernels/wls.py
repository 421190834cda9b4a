"""Batched masked weighted least squares.

Parity target: the GWR solves inside ``twx/interp/interp_tair.py`` —
``GwrTairAnom`` daily-anomaly regression and the trend stage of ``KrigTair``
(SURVEY.md §2.12-2.13). The reference calls numpy lstsq once per cell per
day/month; here one batched solve covers a whole tile of cells, and the
daily-anomaly path is reduced to a *gain row* per (cell, month) so that all
days become a single MXU matmul (see ``topotpu.interp.anoms``).

Shapes: X (B, k, p) design, y (B, k) targets, w (B, k) weights (0 = masked).
p is tiny (<= 8); the normal-equations route keeps everything in registers and
turns the batch into (B, p, p) solves XLA handles well on TPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Solve-chain matmuls must run at full f32 fidelity: the TPU MXU default
# (bf16 inputs) costs DEGREES of error in the WLS/kriging chain (measured
# 2.5-8.9 C vs the CPU oracle on the jnp fallback path) while these ops are
# FLOP-trivial next to the Pallas kernels. No-op on CPU.
HI = jax.lax.Precision.HIGHEST

from jax import lax


def _normal_eq(X: jnp.ndarray, w: jnp.ndarray, ridge: float) -> jnp.ndarray:
    """A = X^T diag(w) X + ridge * tr-scaled I, shape (B, p, p)."""
    Xw = X * w[..., :, None]
    A = jnp.einsum("bkp,bkq->bpq", Xw, X, precision=HI)
    p = X.shape[-1]
    # Scale the ridge by the mean diagonal so conditioning is unit-free.
    diag_mean = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / p
    eye = jnp.eye(p, dtype=X.dtype)
    return A + (ridge * diag_mean + 1e-30) * eye


def batched_wls(
    X: jnp.ndarray,
    y: jnp.ndarray,
    w: jnp.ndarray,
    ridge: float = 1e-6,
) -> jnp.ndarray:
    """Solve the weighted least-squares normal equations per batch element.

    Returns beta (B, p). Masked rows must carry w == 0 and contribute nothing.
    """
    A = _normal_eq(X, w, ridge)
    b = jnp.einsum("bkp,bk->bp", X * w[..., :, None], y, precision=HI)
    L = jnp.linalg.cholesky(A)
    z = lax.linalg.triangular_solve(L, b[..., None], left_side=True, lower=True)
    beta = lax.linalg.triangular_solve(
        L, z, left_side=True, lower=True, transpose_a=True
    )
    return beta[..., 0]


def batched_gwr_gain(
    X: jnp.ndarray,
    w: jnp.ndarray,
    x0: jnp.ndarray,
    ridge: float = 1e-6,
) -> jnp.ndarray:
    """Prediction gain row g (B, k): pred(y) = sum_k g * y for ANY target y.

    g = x0^T (X^T W X)^-1 X^T W. Because X, w, x0 depend only on (cell, month)
    geometry — not on the day — computing g once makes every daily-anomaly
    prediction a dot product, and a month of days one matmul. This is the
    restructuring that moves the reference's hot loop #3 (SURVEY.md §3.1,
    ~25k days x 1e7 cells of per-cell lstsq) onto the MXU.
    """
    A = _normal_eq(X, w, ridge)
    L = jnp.linalg.cholesky(A)
    z = lax.linalg.triangular_solve(L, x0[..., None], left_side=True, lower=True)
    v = lax.linalg.triangular_solve(
        L, z, left_side=True, lower=True, transpose_a=True
    )[..., 0]
    # g_k = w_k * (x_k . v)
    return w * jnp.einsum("bkp,bp->bk", X, v, precision=HI)


def center_design(
    cov_stack: jnp.ndarray,
    cov_point: jnp.ndarray,
    w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build a locally-centered, scaled design matrix.

    Args:
      cov_stack: (B, k, p-1) raw neighbor covariates (no intercept column).
      cov_point: (B, p-1) covariates at the prediction point.
      w: (B, k) weights (0 = masked) used for the scaling statistics.

    Returns (X, x0, scale): X (B, k, p) with intercept column prepended and
    covariates centered at the prediction point and scaled by their weighted
    std; x0 is then exactly e0, so pred = beta[0]. Centering at the point is
    the classic local-regression trick that keeps f32 normal equations
    well-conditioned (SURVEY.md §7 "f32 vs f64" risk item).
    """
    d = cov_stack - cov_point[..., None, :]
    wsum = jnp.sum(w, axis=-1, keepdims=True) + 1e-30  # (B, 1): broadcasts over q
    mean = jnp.sum(w[..., None] * d, axis=-2) / wsum
    var = jnp.sum(w[..., None] * (d - mean[..., None, :]) ** 2, axis=-2) / wsum
    scale = jnp.sqrt(var) + 1e-6
    dn = d / scale[..., None, :]
    B, k, _ = cov_stack.shape
    ones = jnp.ones((B, k, 1), dtype=cov_stack.dtype)
    X = jnp.concatenate([ones, dn], axis=-1)
    x0 = jnp.zeros((B, X.shape[-1]), dtype=cov_stack.dtype).at[:, 0].set(1.0)
    return X, x0, scale
