"""Pairwise homogenization (PHA-equivalent).

Parity target: the reference's homogenization stage (SURVEY.md §2.7, §3.5):
``twx/homog`` wraps NCEI's external PHA v52i Fortran program — write monthly
series to PHA's input layout, execute it, parse adjustments, apply the
monthly deltas to daily obs. This module replaces the external binary with
an in-repo implementation: the numeric core (batched SNHT changepoint
detection + step estimation) is C++ (``pha_core.cpp``, built on demand with
g++ and called through ctypes), and the network logic (pair formation,
attribution voting, adjustment accumulation) is numpy.

Algorithm (classic pairwise approach, Menne & Williams 2009):
  1. monthly mean series per station; anomalies vs station climatology;
  2. each station pairs with its most-correlated neighbors; difference
     series target - neighbor isolate non-climatic steps;
  3. SNHT binary segmentation flags breaks in each difference series (C++);
  4. a break is attributed to the target when a quorum of its pairs agree
     on the date (+-tol months) — the neighbor-voting step that
     distinguishes the culprit station from its witnesses;
  5. each attributed break is classified by minbic model selection
     (const / trend / step / sloped step / two-segment trend, chosen by
     BIC, as in Lund & Reeves 2002 / the PHA "minbic" stage): trend-only
     inhomogeneities are NOT adjusted as steps, and a confirming pair
     must also clear a t-statistic threshold on the fitted offset, making
     significance amplitude-dependent;
  6. per confirmed break, the step size is the trimmed mean of the
     model-fitted pair offsets; segments before each break are shifted so
     the whole series matches its most recent (assumed-correct) segment;
  7. monthly adjustments are broadcast to the daily series.
"""

from __future__ import annotations

import ctypes
import dataclasses
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "_build" / "libpha.so"
_SRC = _DIR / "pha_core.cpp"


def _load_lib() -> ctypes.CDLL:
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        _SO.parent.mkdir(exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(str(_SO))
    lib.pha_detect_breaks.restype = ctypes.c_int
    lib.pha_detect_breaks.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
    ]
    lib.pha_break_model.restype = ctypes.c_int
    lib.pha_break_model.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    return lib


_lib = None


def _lib_handle():
    global _lib
    if _lib is None:
        _lib = _load_lib()
    return _lib


def detect_breaks(series: np.ndarray, minseg: int = 24, max_breaks: int = 5):
    """(N, T) difference series -> (breaks (N, max_breaks) int32 [-1 pad],
    stats (N, max_breaks) f64). C++ batched SNHT binary segmentation."""
    series = np.ascontiguousarray(series, np.float32)
    N, T = series.shape
    breaks = np.empty((N, max_breaks), np.int32)
    stats = np.empty((N, max_breaks), np.float64)
    lib = _lib_handle()
    lib.pha_detect_breaks(
        series.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), N, T,
        minseg, max_breaks,
        breaks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return breaks, stats


def break_model(x: np.ndarray, brk: int, lo: int, hi: int,
                min_side: int = 12) -> tuple[int, float, float]:
    """Lund-Reeves/minbic model selection at a candidate break (C++).

    Fits const / trend / step / step+common-slope / two-segment-trend mean
    functions to the finite months of ``x[lo:hi)`` with the break before
    month ``brk`` and picks the minimum-BIC model — the discrimination step
    that full Menne-Williams PHA applies after SNHT detection, so a trend
    inhomogeneity is classified as model 1 instead of being misread as a
    step, and a sloped-step's offset is estimated without trend bias.

    Returns ``(model, step, tstat)``: model id (0 const, 1 trend, 2 step,
    3 step+slope, 4 two slopes; -1 degenerate), the fitted offset at the
    break (0 for 0/1), and its t-statistic (amplitude-dependent
    significance: callers threshold on ``|tstat|``).
    """
    x = np.ascontiguousarray(x, np.float32)
    step = ctypes.c_double()
    tstat = ctypes.c_double()
    lib = _lib_handle()
    model = lib.pha_break_model(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x), int(brk), int(lo), int(hi), int(min_side),
        ctypes.byref(step), ctypes.byref(tstat),
    )
    return int(model), float(step.value), float(tstat.value)


# ------------------------------------------------------------------ driver


@dataclasses.dataclass
class HomogResult:
    adjusted_daily: np.ndarray    # (S, T) daily series with adjustments
    adjustments: np.ndarray       # (S, M) monthly adjustment applied
    breakpoints: list[list[tuple[int, float]]]  # per station: (month_idx, step)
    monthly: np.ndarray           # (S, M) original monthly means


def monthly_means(daily: np.ndarray, year: np.ndarray, month: np.ndarray,
                  min_days: int = 20):
    """(S, T) daily + calendar -> (S, M) monthly means (NaN if sparse) and
    the (M,) month start keys."""
    keys = year * 12 + (month - 1)
    uniq = np.unique(keys)
    S = daily.shape[0]
    out = np.full((S, len(uniq)), np.nan, np.float32)
    for i, k in enumerate(uniq):
        sel = keys == k
        block = daily[:, sel]
        n = np.isfinite(block).sum(axis=1)
        s = np.nansum(np.where(np.isfinite(block), block, 0.0), axis=1)
        out[:, i] = np.where(n >= min_days, s / np.maximum(n, 1), np.nan)
    return out, uniq


def homogenize_network(
    daily: np.ndarray,
    year: np.ndarray,
    month: np.ndarray,
    stn_lon: np.ndarray,
    stn_lat: np.ndarray,
    n_pairs: int = 8,
    quorum_frac: float = 0.5,
    quorum_min: int = 3,
    date_tol: int = 6,
    minseg: int = 24,
    max_breaks: int = 5,
    t_crit: float = 3.0,
) -> HomogResult:
    """Homogenize an (S, T) daily network in place of the reference's PHA run."""
    S, T = daily.shape
    monthly, keys = monthly_means(daily, year, month)
    M = monthly.shape[1]
    cal_month = (keys % 12).astype(int)

    # anomalies vs station monthly climatology (count-guarded nanmean)
    clim = np.full((S, 12), np.nan, np.float32)
    for m in range(12):
        sel = cal_month == m
        block = monthly[:, sel]
        n = np.isfinite(block).sum(axis=1)
        s = np.nansum(np.where(np.isfinite(block), block, 0.0), axis=1)
        clim[:, m] = np.where(n > 0, s / np.maximum(n, 1), np.nan)
    anom = monthly - clim[:, cal_month]

    # pair selection: most-correlated neighbors on monthly anomalies
    from topotpu.infill.pipeline import masked_correlation

    corr = masked_correlation(anom, np.isfinite(anom))
    # overlap requirement inside masked_correlation is 30 *days*; fine for months
    order = np.argsort(-np.abs(corr), axis=1)[:, :n_pairs]

    # difference series for every (target, neighbor) pair
    diffs = np.full((S, n_pairs, M), np.nan, np.float32)
    for s in range(S):
        diffs[s] = anom[s][None, :] - anom[order[s]]

    breaks, stats = detect_breaks(diffs.reshape(S * n_pairs, M), minseg, max_breaks)
    breaks = breaks.reshape(S, n_pairs, max_breaks)

    # attribution voting: break at month b attributed to target s when a
    # quorum of its pairs see a break within +-date_tol
    breakpoints: list[list[tuple[int, float]]] = []
    adjustments = np.zeros((S, M), np.float32)
    for s in range(S):
        # Votes: a true break at the target is witnessed by (nearly) every
        # pair, while a neighbor's own break shows in just one pair — so a
        # date cluster reaching the quorum is attributed to the target.
        cand_sorted = np.sort(breaks[s][breaks[s] >= 0])
        need = max(quorum_min, int(np.ceil(quorum_frac * n_pairs)))
        attributed: list[int] = []
        i = 0
        while i < len(cand_sorted):
            close = np.abs(cand_sorted - cand_sorted[i]) <= date_tol
            if int(close.sum()) >= need:
                center = int(np.median(cand_sorted[close]))
                if not attributed or center - attributed[-1] >= minseg:
                    attributed.append(center)
            i += int(close.sum())

        # Break-model confirmation + step estimation per attributed break.
        # For each pair series, minbic model selection classifies the
        # neighborhood of the break: only pairs whose best model contains a
        # step (2/3/4) AND whose step t-statistic clears t_crit count as
        # confirmations — so a trend inhomogeneity (model 1 wins) is never
        # adjusted as a step, and significance is amplitude-dependent (a
        # small offset in noisy/short segments has small t and is dropped).
        # The step estimate comes from the winning model, which de-biases
        # sloped steps that the naive window-mean estimator would smear.
        stn_breaks: list[tuple[int, float]] = []
        bounds = [0] + attributed + [M]
        for bi, b in enumerate(attributed):
            lo, hi = bounds[bi], bounds[bi + 2]
            steps = []
            for p in range(n_pairs):
                model, st, tstat = break_model(diffs[s, p], b, lo, hi)
                if model >= 2 and np.isfinite(st) and abs(tstat) >= t_crit:
                    steps.append(st)
            if len(steps) >= quorum_min:
                steps = np.sort(steps)
                k = len(steps) // 5
                est = float(np.mean(steps[k : len(steps) - k] if len(steps) > 2 * k else steps))
                stn_breaks.append((int(b), est))
        breakpoints.append(stn_breaks)

        # adjust-to-latest: months before each break get minus the
        # accumulated later steps
        adj = np.zeros(M, np.float32)
        for b, est in stn_breaks:
            adj[:b] += np.float32(est)  # adjust-to-latest accumulates
        adjustments[s] = adj

    # broadcast monthly adjustments to daily values
    keys_daily = year * 12 + (month - 1)
    key_to_idx = {k: i for i, k in enumerate(keys)}
    midx = np.array([key_to_idx[k] for k in keys_daily])
    adjusted = daily + adjustments[:, midx]

    return HomogResult(
        adjusted_daily=adjusted,
        adjustments=adjustments,
        breakpoints=breakpoints,
        monthly=monthly,
    )
