"""Moving-window regression kriging of monthly normals.

Parity target: ``twx/interp/interp_tair.py::KrigTair`` (SURVEY.md §2.12) —
per cell x month: GWR trend on covariates (elevation, TDI, monthly MODIS LST)
plus ordinary kriging of the trend residuals with per-cell exponential
variogram parameters, producing the kriged mean AND kriging variance (the
reference's 95% CI source). The reference runs this through rpy2 -> R gstat
once per cell; here a whole tile of cells is one batched jit.

Variogram parameters per cell are distance-weighted interpolations of the
per-station fitted parameters, mirroring the reference's design of fitting
variograms at stations once and interpolating them to cells (SURVEY.md §3.3).

All arrays arrive pre-gathered per neighborhood (see ``topotpu.interp.point``
for the gather stage): shapes (C, k) / (C, k, q) with a validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from topotpu.geo.distance import pairwise_km_from_xyz
from topotpu.geo.neighbors import distance_weights
from topotpu.kernels.cholesky import assemble_exp_cov, ok_solve
from topotpu.kernels.wls import batched_wls, center_design


class NormalsResult(NamedTuple):
    normal: jnp.ndarray    # (C,) kriged monthly normal
    variance: jnp.ndarray  # (C,) kriging variance (deg C^2)
    se: jnp.ndarray        # (C,) sqrt variance
    trend: jnp.ndarray     # (C,) GWR trend component (diagnostic)
    ok: jnp.ndarray        # (C,) bool solvable flag
    vario: jnp.ndarray     # (C, 3) cell-interpolated nugget/psill/range


def interp_cell_variogram(
    nbr_vario: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """(C, k, 3) station params + (C, k) weights -> (C, 3) cell params."""
    wsum = jnp.sum(w, axis=-1, keepdims=True) + 1e-30
    v = jnp.einsum("ck,ckp->cp", w, nbr_vario) / wsum
    nug = jnp.maximum(v[..., 0], 0.0)
    psill = jnp.maximum(v[..., 1], 1e-6)
    rng = jnp.maximum(v[..., 2], 1e-2)
    return jnp.stack([nug, psill, rng], axis=-1)


def krig_normals(
    dist: jnp.ndarray,
    mask: jnp.ndarray,
    nbr_xyz: jnp.ndarray,
    nbr_cov: jnp.ndarray,
    cell_cov: jnp.ndarray,
    nbr_norm: jnp.ndarray,
    nbr_vario: jnp.ndarray,
    weight_kernel: str = "bisquare",
    ridge: float = 1e-6,
    jitter_frac: float = 1e-5,
    min_neighbors: int = 3,
) -> NormalsResult:
    """Regression-krige monthly normals for a batch of cells.

    Args:
      dist: (C, k) neighbor distances, km. mask: (C, k) validity.
      nbr_xyz: (C, k, 3) neighbor unit-sphere coords (for pair distances).
      nbr_cov: (C, k, q) neighbor covariates; cell_cov: (C, q) at the cell.
      nbr_norm: (C, k) neighbor station monthly normals.
      nbr_vario: (C, k, 3) per-station (nugget, psill, range).
    """
    w = distance_weights(dist, mask, weight_kernel)

    # --- GWR trend (the reference's trend surface) ---
    X, x0, _ = center_design(nbr_cov, cell_cov, w)
    beta = batched_wls(X, nbr_norm, w, ridge)
    trend_cell = jnp.einsum("cp,cp->c", x0, beta)
    trend_at_stn = jnp.einsum("ckp,cp->ck", X, beta)
    resid = jnp.where(mask, nbr_norm - trend_at_stn, 0.0)

    # --- per-cell variogram params (interpolated, not refit: SURVEY §3.3) ---
    vario = interp_cell_variogram(nbr_vario, w)

    # --- ordinary kriging of residuals ---
    dist_pair = pairwise_km_from_xyz(nbr_xyz, nbr_xyz)
    C, c0, sill = assemble_exp_cov(
        dist_pair,
        dist,
        vario[..., 0],
        vario[..., 1],
        vario[..., 2],
        mask,
        jitter_frac=jitter_frac,
    )
    sol = ok_solve(C, c0, mask, sill, min_neighbors)
    resid_krig = jnp.sum(sol.weights * resid, axis=-1)

    normal = trend_cell + resid_krig
    var = sol.variance
    return NormalsResult(
        normal=normal,
        variance=var,
        se=jnp.sqrt(jnp.maximum(var, 0.0)),
        trend=trend_cell,
        ok=sol.ok,
        vario=vario,
    )
