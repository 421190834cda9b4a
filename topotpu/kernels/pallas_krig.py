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

# Validity window of the in-kernel Taylor asin (see _krig_kernel_xyz): the
# 4-term odd series is exact to <1e-6 relative for half-chord < 0.2, i.e.
# pair distances below ~2500 km. Callers whose station pools could span more
# must fall back to the exact-asin (jnp) path — the TileEngine derives its
# worst-case pool chord from tile extent + margin and enforces this bound.
ASIN_VALID_KM = 2.0 * EARTH_RADIUS_KM * 0.2  # ~2548 km


def _krig_kernel(dp_ref, d0_ref, m_ref, nug_ref, ps_ref, rg_ref, out_ref,
                 Cs, y0, y1, LT=None, *, k: int, lanes: int,
                 jitter_frac: float, min_neighbors: int):
    """Entry point taking precomputed pair distances (k, k, lanes)."""
    _solve_body(dp_ref[:, :, :], d0_ref, m_ref, nug_ref, ps_ref, rg_ref,
                out_ref, Cs, y0, y1, LT, k=k, lanes=lanes,
                jitter_frac=jitter_frac, min_neighbors=min_neighbors)


def _krig_kernel_xyz(xyz_ref, d0_ref, m_ref, nug_ref, ps_ref, rg_ref, out_ref,
                     Cs, y0, y1, LT=None, *, k: int, lanes: int,
                     jitter_frac: float, min_neighbors: int):
    """Entry point computing pair distances in-kernel from unit-sphere xyz.

    xyz_ref is (3k, lanes): rows [0:k) = x, [k:2k) = y, [2k:3k) = z. Moving
    the distance computation into the kernel replaces the (k, k, B) HBM
    tensor (268 MB per 65k-cell month at k=32) with a (3k, B) one (25 MB) —
    the XLA-side construction of the big tensor had become the bottleneck
    after the solve was fused.
    """
    # asin has no Pallas TPU lowering; _pair_dists' odd Taylor series is
    # exact to <1e-6 relative for half-chord < 0.2 (~2500 km window).
    # Beyond that the covariance exp(-d/rng) is ~0, so residual series
    # error is inert.
    dp = _pair_dists(xyz_ref, k)
    _solve_body(dp, d0_ref, m_ref, nug_ref, ps_ref, rg_ref,
                out_ref, Cs, y0, y1, LT, k=k, lanes=lanes,
                jitter_frac=jitter_frac, min_neighbors=min_neighbors)


def _assemble_C(dp, m, nug, ps, rg, jitter_frac, k):
    """Fused covariance assembly (kernels/cholesky.py::assemble_exp_cov)."""
    sill = nug + ps
    C = ps[None, None, :] * jnp.exp(-dp / rg[None, None, :])
    pair = m[:, None, :] * m[None, :, :]
    C = C * pair
    # 3-D iota (Mosaic cannot reshape 2-D bool vectors to 3-D)
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    eyef = (rows3 == cols3).astype(jnp.float32)        # (k, k, 1)
    diag_add = m * (nug + jitter_frac * sill)[None, :] + (1.0 - m)
    return C + eyef * diag_add[:, None, :]


def _chol_and_two_solves_looped(Cs, LT, y0, y1, k):
    """fori_loop Cholesky + solves for large k: O(1) traced ops regardless
    of k, so the Mosaic program (and compile time) stays FLAT in k — the
    unrolled variants compile pathologically past ~48 (KNOWN_GAPS r1 #7).

    Trick that makes the loop legal: Mosaic supports dynamic slicing only
    on the LEADING dim here, so the factor is stored TRANSPOSED in the LT
    scratch (LT[j] = column j of L = row j of U=L^T). Then:
      * factorization reads row j of the still-symmetric trailing matrix
        (== column j) and writes one LT row;
      * forward substitution is column-oriented (uses L[:, j] = LT[j]);
      * back substitution is row-oriented (uses U[j, :] = LT[j]);
    every step is full-(k, lanes)-shaped with iota masks against the
    dynamic j — ~3x the FLOPs of the triangular unroll (same as the
    retired uniform-shape variant), bought back by not melting compiles."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    def fact(j, carry):
        here = (rows == j).astype(jnp.float32)
        low = (rows > j).astype(jnp.float32)
        row_j = Cs[pl.ds(j, 1), :, :][0]              # (k, lanes)
        djj = jnp.sum(row_j * here, axis=0)
        dj = jnp.sqrt(jnp.maximum(djj, 1e-20))
        inv = 1.0 / dj
        col = row_j * inv[None, :] * low              # strict below-diag
        LT[pl.ds(j, 1), :, :] = (col + here * dj[None, :])[None]
        Cs[:, :, :] = Cs[:, :, :] - col[:, None, :] * col[None, :, :]
        return carry

    jax.lax.fori_loop(0, k, fact, 0, unroll=False)

    def fwd(j, carry):
        here = (rows == j).astype(jnp.float32)
        low = (rows > j).astype(jnp.float32)
        lcol = LT[pl.ds(j, 1), :, :][0]               # (k, lanes) = L[:, j]
        inv = 1.0 / jnp.sum(lcol * here, axis=0)
        a_j = jnp.sum(y0[:, :] * here, axis=0) * inv
        u_j = jnp.sum(y1[:, :] * here, axis=0) * inv
        sub = lcol * low
        y0[:, :] = jnp.where(here > 0.0, a_j[None, :], y0[:, :]) - sub * a_j[None, :]
        y1[:, :] = jnp.where(here > 0.0, u_j[None, :], y1[:, :]) - sub * u_j[None, :]
        return carry

    jax.lax.fori_loop(0, k, fwd, 0, unroll=False)

    def bwd(i, carry):
        j = k - 1 - i
        here = (rows == j).astype(jnp.float32)
        above = (rows > j).astype(jnp.float32)        # already-final entries
        urow = LT[pl.ds(j, 1), :, :][0]               # (k, lanes) = U[j, :]
        inv = 1.0 / jnp.sum(urow * here, axis=0)
        s0 = jnp.sum(urow * above * y0[:, :], axis=0)
        s1 = jnp.sum(urow * above * y1[:, :], axis=0)
        a_j = (jnp.sum(y0[:, :] * here, axis=0) - s0) * inv
        u_j = (jnp.sum(y1[:, :] * here, axis=0) - s1) * inv
        y0[:, :] = jnp.where(here > 0.0, a_j[None, :], y0[:, :])
        y1[:, :] = jnp.where(here > 0.0, u_j[None, :], y1[:, :])
        return carry

    jax.lax.fori_loop(0, k, bwd, 0, unroll=False)


LOOPED_K_THRESHOLD = 32  # above this the unrolled factorization is retired


def padded_kernel_k(k: int) -> int:
    """Effective neighborhood size the fused kernel should run at.

    Measured Mosaic compile times through this container's tunnel (whole
    kernel, 2048 cells): k=32 unrolled seconds; k=48 is PATHOLOGICAL via
    every path (234 s unrolled, 206-330 s looped, at 128 or 256 lanes);
    k=56 and k=64 looped compile in ~12 s. So sizes in the bad band are
    padded up to 56 — masked neighbor rows are provably inert (the tests
    assert zero weight and untouched variance), so the only cost is FLOPs
    on the padded rows, far cheaper than a 4-minute compile."""
    return 56 if LOOPED_K_THRESHOLD < k < 56 else k


def _chol_and_two_solves(Cs, y0, y1, k, LT=None):
    """In-place Cholesky + forward/back substitution for two rhs, unrolled
    over k (static) — every step is one VPU op over all lanes. Past
    LOOPED_K_THRESHOLD the fori_loop variant takes over (needs LT scratch)."""
    if k > LOOPED_K_THRESHOLD:
        assert LT is not None, (
            f"k > LOOPED_K_THRESHOLD ({LOOPED_K_THRESHOLD}) needs the LT "
            "scratch buffer"
        )
        return _chol_and_two_solves_looped(Cs, LT, y0, y1, k)
    for j in range(k):
        dj = jnp.sqrt(jnp.maximum(Cs[j, j, :], 1e-20))
        inv = 1.0 / dj
        Cs[j, j, :] = dj
        if j + 1 < k:
            col = Cs[j + 1 :, j, :] * inv[None, :]
            Cs[j + 1 :, j, :] = col
            Cs[j + 1 :, j + 1 :, :] = (
                Cs[j + 1 :, j + 1 :, :] - col[:, None, :] * col[None, :, :]
            )
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


def _ok_reduce(y0, y1, c0, m, sill, min_neighbors):
    """SK -> OK reduction (kernels/cholesky.py::ok_solve)."""
    a = y0[:, :] * m
    u = y1[:, :] * m
    sum_a = jnp.sum(a, axis=0)
    sum_u = jnp.sum(u, axis=0)
    n_valid = jnp.sum(m, axis=0)
    ok = (n_valid >= float(min_neighbors)) & (sum_u > 1e-12)
    t = (1.0 - sum_a) / jnp.where(ok, sum_u, 1.0)
    lam = a + t[None, :] * u
    var = jnp.maximum(sill - jnp.sum(lam * c0, axis=0) + t, 0.0)
    return lam, var, ok


def _solve_body(dp, d0_ref, m_ref, nug_ref, ps_ref, rg_ref, out_ref,
                Cs, y0, y1, LT=None, *, k: int, lanes: int,
                jitter_frac: float, min_neighbors: int):
    nug = nug_ref[0, :]                      # (lanes,)
    ps = ps_ref[0, :]
    rg = jnp.maximum(rg_ref[0, :], 1e-3)
    m = m_ref[:, :]                          # (k, lanes) 0/1
    sill = nug + ps

    Cs[:, :, :] = _assemble_C(dp, m, nug, ps, rg, jitter_frac, k)
    c0 = ps[None, :] * jnp.exp(-d0_ref[:, :] / rg[None, :]) * m  # (k, lanes)
    y0[:, :] = c0
    y1[:, :] = m
    _chol_and_two_solves(Cs, y0, y1, k, LT)
    lam, var, ok = _ok_reduce(y0, y1, c0, m, sill, min_neighbors)

    out_ref[0:k, :] = lam
    out_ref[k, :] = var
    out_ref[k + 1, :] = ok.astype(jnp.float32)
    out_ref[k + 2 :, :] = jnp.zeros((_OUT_EXTRA - 2, lanes), jnp.float32)


def _solve_spd_small(A, b, p):
    """Unrolled Cholesky solve for a tiny SPD system held as per-lane scalar
    arrays: A is a lower-triangular list-of-lists a[i][j] (i >= j), b a list
    of p arrays. Returns x as a list of p arrays. Pure straight-line code."""
    L = [[None] * p for _ in range(p)]
    for i in range(p):
        for j in range(i + 1):
            s = A[i][j]
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * p
    for i in range(p):
        s = b[i]
        for t in range(i):
            s = s - L[i][t] * y[t]
        y[i] = s / L[i][i]
    x = [None] * p
    for i in reversed(range(p)):
        s = y[i]
        for t in range(i + 1, p):
            s = s - L[t][i] * x[t]
        x[i] = s / L[i][i]
    return x


def _pair_dists(xyz_ref, k):
    """In-kernel pair distances from (3k, lanes) unit-sphere xyz rows
    (Taylor-asin chord form; see _krig_kernel_xyz for the validity note)."""
    d2 = None
    for c in range(3):
        v = xyz_ref[c * k : (c + 1) * k, :]
        diff = v[:, None, :] - v[None, :, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    half = jnp.clip(0.5 * jnp.sqrt(d2), 0.0, 1.0)
    h2 = half * half
    asin_h = half * (
        1.0 + h2 * (1.0 / 6.0 + h2 * (3.0 / 40.0 + h2 * (15.0 / 336.0)))
    )
    return 2.0 * EARTH_RADIUS_KM * asin_h


def _weight_rows(d, m, weight_kernel):
    """Distance weights (geo.neighbors.distance_weights); the kernel choice
    is a STATIC arg, so each variant traces branch-free code."""
    bw = jnp.maximum(jnp.max(jnp.where(m > 0.0, d, 0.0), axis=0), 1e-3)
    if weight_kernel == "bisquare":
        r = jnp.minimum(d / bw[None, :], 1.0)
        w = jnp.maximum((1.0 - r * r) ** 2, 1e-4) * m
    elif weight_kernel == "gaussian":
        rb = d / bw[None, :]
        w = jnp.exp(-0.5 * rb * rb) * m
    elif weight_kernel == "uniform":
        w = m
    else:
        raise ValueError(f"unknown weight kernel {weight_kernel!r}")
    return w, jnp.sum(w, axis=0) + 1e-30


def _wls_design(cov_ref, cell_ref, cell_row0, w, wsum, m, k, q):
    """Centered scaled design columns (kernels.wls.center_design)."""
    dn = [jnp.ones_like(m)]
    for c in range(q):
        dc = cov_ref[c * k : (c + 1) * k, :] - cell_ref[cell_row0 + c, :][None, :]
        mean = jnp.sum(w * dc, axis=0) / wsum
        var = jnp.sum(w * (dc - mean[None, :]) ** 2, axis=0) / wsum
        scale = jnp.sqrt(var) + 1e-6
        dn.append(dc / scale[None, :])
    return dn  # p = q+1 columns, each (k, lanes)


def _wls_normal_eq(X, w, ridge, p):
    """A (lower-tri list-of-lists) with the scaled ridge of batched_wls."""
    A = [[None] * p for _ in range(p)]
    for i in range(p):
        for j in range(i + 1):
            A[i][j] = jnp.sum(w * X[i] * X[j], axis=0)
    diag_mean = sum(A[i][i] for i in range(p)) / p
    reg = ridge * diag_mean + 1e-30
    for i in range(p):
        A[i][i] = A[i][i] + reg
    return A


def _normals_kernel(xyz_ref, dist_ref, m_ref, cov_ref, cell_ref, norm_ref,
                    vario_ref, acov_ref, out_ref, Cs, y0, y1, LT=None, *,
                    k: int, q: int, qa: int, lanes: int, ridge: float,
                    jitter_frac: float, min_neighbors: int,
                    weight_kernel: str):
    """The WHOLE krig_normals per-cell chain in one kernel: distance
    weights -> point-centered scaled GWR design -> (q+1)x(q+1) WLS trend ->
    residuals -> distance-weighted variogram-parameter interpolation ->
    in-kernel pair distances -> Cholesky kriging solve -> OK reduction ->
    trend + kriged residual. Mirrors interp/normals.py::krig_normals
    formula-for-formula (parity-tested)."""
    m = m_ref[:, :]                              # (k, lanes)
    d = dist_ref[:, :]
    w, wsum = _weight_rows(d, m, weight_kernel)

    # --- centered scaled design + normal equations (geometry-only) ---
    p = q + 1
    X = _wls_design(cov_ref, cell_ref, 0, w, wsum, m, k, q)
    A = _wls_normal_eq(X, w, ridge, p)

    # --- pair distances from xyz (geometry-only) ---
    dp = _pair_dists(xyz_ref, k)

    _var_chain(norm_ref[:, :], vario_ref, out_ref, 0, m, d, w, wsum, X, A,
               dp, Cs, y0, y1, LT, k=k, p=p, lanes=lanes,
               jitter_frac=jitter_frac, min_neighbors=min_neighbors)

    # --- anomaly GWR gain rows (kernels.wls.batched_gwr_gain) -------------
    # same neighborhoods/weights, anomaly covariates; x0 = e0 after
    # centering so the gain needs A^-1 e0 only.
    _gain_rows(acov_ref, cell_ref, out_ref, 8, w, wsum, m, k, q, qa, ridge)


def _var_chain(norm, vario_ref, out_ref, row0, m, d, w, wsum, X, A, dp,
               Cs, y0, y1, LT, *, k, p, lanes, jitter_frac, min_neighbors):
    """Per-VARIABLE tail of the normals chain: WLS trend fit (shared
    normal-equations matrix A, variable-specific RHS), variogram-parameter
    interpolation, covariance assembly + Cholesky kriging solve + OK
    reduction. Writes 8 output rows starting at ``row0``. The scratch
    (Cs/y0/y1/LT) is safely reused across sequential calls."""
    b = [jnp.sum(w * X[i] * norm, axis=0) for i in range(p)]
    beta = _solve_spd_small(A, b, p)

    trend = beta[0]                              # x0 = e0 after centering
    trend_at = beta[0][None, :] * X[0]
    for i in range(1, p):
        trend_at = trend_at + beta[i][None, :] * X[i]
    resid = (norm - trend_at) * m

    # --- variogram params interpolated to the cell (interp_cell_variogram)
    nug = jnp.maximum(
        jnp.sum(w * vario_ref[0:k, :], axis=0) / wsum, 0.0
    )
    ps = jnp.maximum(
        jnp.sum(w * vario_ref[k : 2 * k, :], axis=0) / wsum, 1e-6
    )
    rg = jnp.maximum(
        jnp.sum(w * vario_ref[2 * k : 3 * k, :], axis=0) / wsum, 1e-2
    )
    rg = jnp.maximum(rg, 1e-3)
    sill = nug + ps

    Cs[:, :, :] = _assemble_C(dp, m, nug, ps, rg, jitter_frac, k)
    c0 = ps[None, :] * jnp.exp(-d / rg[None, :]) * m
    y0[:, :] = c0
    y1[:, :] = m
    _chol_and_two_solves(Cs, y0, y1, k, LT)
    lam, var_k, ok = _ok_reduce(y0, y1, c0, m, sill, min_neighbors)

    normal = trend + jnp.sum(lam * resid, axis=0)
    out_ref[row0 + 0, :] = normal
    out_ref[row0 + 1, :] = var_k
    out_ref[row0 + 2, :] = ok.astype(jnp.float32)
    out_ref[row0 + 3, :] = trend
    out_ref[row0 + 4, :] = nug
    out_ref[row0 + 5, :] = ps
    out_ref[row0 + 6, :] = rg
    out_ref[row0 + 7, :] = jnp.zeros((lanes,), jnp.float32)


def _gain_rows(acov_ref, cell_ref, out_ref, row0, w, wsum, m, k, q, qa, ridge):
    pa = qa + 1
    Xa = _wls_design(acov_ref, cell_ref, q, w, wsum, m, k, qa)
    Aa = _wls_normal_eq(Xa, w, ridge, pa)
    e0 = [jnp.ones_like(w[0])] + [jnp.zeros_like(w[0]) for _ in range(pa - 1)]
    v = _solve_spd_small(Aa, e0, pa)
    gx = v[0][None, :] * Xa[0]
    for i in range(1, pa):
        gx = gx + v[i][None, :] * Xa[i]
    out_ref[row0:, :] = w * gx


# Two launch-structure variants were built, parity-tested, measured and
# REJECTED — recorded so they are not retried blind:
# 1. A two-variable kernel BODY (shared weights/design/pair-distances,
#    two _var_chain calls per program): ~1% end-to-end — the per-variable
#    Cholesky solve dominates and the shared geometry work is cheap —
#    while doubling the Mosaic program size (one remote compile died OOM).
# 2. A year-batched launch (ONE pallas_call whose grid covered every
#    (month, variable) via month-aware BlockSpec index maps): ~3% SLOWER
#    (824k vs 850k var-cells/s) — the ~2.6 ms fixed cost seen when timing
#    separate jit calls is per PROGRAM dispatch over the tunnel, not per
#    pallas_call inside a program, so there was no launch overhead to
#    save, and the month-stacked input materialization added traffic.
# The composition of per-(month, variable) single-variable kernels stays.


@functools.partial(
    jax.jit,
    static_argnames=("ridge", "jitter_frac", "min_neighbors", "interpret",
                     "weight_kernel"),
)
def krig_normals_fused(
    xyz3k: jnp.ndarray,    # (3k, B) unit-sphere coords, c-major
    dist_t: jnp.ndarray,   # (k, B) exact neighbor distances
    mask_t: jnp.ndarray,   # (k, B) f32 0/1
    covs_t: jnp.ndarray,   # (qk, B) trend covariates, covariate-major
    cell_t: jnp.ndarray,   # (8, B) cell covariates: trend rows 0..q-1,
                           # anomaly rows q..q+qa-1
    norm_t: jnp.ndarray,   # (k, B) station monthly normals
    vario_t: jnp.ndarray,  # (3k, B) nugget rows, psill rows, range rows
    acovs_t: jnp.ndarray,  # (qa*k, B) anomaly-GWR covariates
    ridge: float = 1e-6,
    jitter_frac: float = 1e-5,
    min_neighbors: int = 3,
    interpret: bool = False,
    weight_kernel: str = "bisquare",
):
    """Whole-krig_normals + anomaly-gain fusion. Returns (8+k, B):
    rows [normal, variance, ok, trend, nugget, psill, range, 0] then the k
    anomaly-GWR gain rows."""
    k, B = dist_t.shape
    q = covs_t.shape[0] // k
    qa = acovs_t.shape[0] // k
    lanes = _pick_lanes(B, k)
    grid = (B // lanes,)
    kern = functools.partial(
        _normals_kernel, k=k, q=q, qa=qa, lanes=lanes, ridge=ridge,
        jitter_frac=jitter_frac, min_neighbors=min_neighbors,
        weight_kernel=weight_kernel,
    )
    col = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, lanes), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[col(3 * k), col(k), col(k), col(q * k), col(8), col(k),
                  col(3 * k), col(qa * k)],
        out_specs=col(8 + k),
        out_shape=jax.ShapeDtypeStruct((8 + k, B), jnp.float32),
        scratch_shapes=_scratch(k, lanes),
        cost_estimate=pl.CostEstimate(
            flops=int(B * (k**3 / 3 + 14 * k**2 + 60 * k)),
            bytes_accessed=int(B * (13 * k + 16) * 4),
            transcendentals=int(B * (k * k + k)),
        ),
        interpret=interpret,
    )(
        xyz3k.astype(jnp.float32),
        dist_t.astype(jnp.float32),
        mask_t.astype(jnp.float32),
        covs_t.astype(jnp.float32),
        cell_t.astype(jnp.float32),
        norm_t.astype(jnp.float32),
        vario_t.astype(jnp.float32),
        acovs_t.astype(jnp.float32),
    )


def _pick_lanes(B, k):
    """Widest lane count that divides B and fits the ~16 MB VMEM budget.

    Empirical footprint: ~20 bytes per k^2*lane element for the unrolled
    path (Cs scratch + ~4 live (k,k,lanes) kernel temporaries — matches the
    measured 20.8 MB at k=32/1024 lanes and 10.5 MB at the proven
    k=32/512 production config), ~24 with the looped path's extra LT
    scratch (matches the 22.1 MB OOM observed at k=64/256 lanes)."""
    bpe = 24 if k > LOOPED_K_THRESHOLD else 20
    lanes = next(
        (l for l in (LANES, 256, 128)
         if B % l == 0 and k * k * l * bpe <= 15 * 2**20),
        None,
    )
    assert lanes, f"batch {B} not a multiple of 128 (or k={k} too large)"
    return lanes


def _scratch(k, lanes):
    shapes = [
        pltpu.VMEM((k, k, lanes), jnp.float32),
        pltpu.VMEM((k, lanes), jnp.float32),
        pltpu.VMEM((k, lanes), jnp.float32),
    ]
    if k > LOOPED_K_THRESHOLD:  # LT factor storage for the fori_loop path
        shapes.append(pltpu.VMEM((k, k, lanes), jnp.float32))
    return shapes


def _launch(entry, first_arg, first_block_rows3, k, B,
            dist_point_t, mask_t, nugget, psill, rng,
            jitter_frac, min_neighbors, interpret):
    lanes = _pick_lanes(B, k)
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
        scratch_shapes=_scratch(k, lanes),
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
