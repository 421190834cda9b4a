"""Cross-validation machinery (the reference's validation story, SURVEY §4)."""

import numpy as np
import pytest

from topotpu.core.config import InterpParams, PPCAParams
from topotpu.core.dates import get_days_metadata
from topotpu.interp.xval import xval_interp_normals, xval_infill, optimize_nnghs
from topotpu.io.synthetic import make_world


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(17)
    return make_world(rng, nrows=60, ncols=60, n_stations=150, ndays=365)


def _vario(world):
    nug, ps, rg = world.true_vario
    return np.tile(np.array([nug, ps, rg], np.float32), (world.n_stations, 12, 1))


def test_loo_xval_paper_scale_accuracy(world):
    sc = xval_interp_normals(
        world.stn_lon, world.stn_lat, world.stn_elev, world.stn_tdi,
        world.stn_lst, world.stn_norm, _vario(world),
        np.ones((world.n_stations, 12), bool), InterpParams(k_neighbors=16),
    )
    # paper-scale (SURVEY §6): annual normal MAE ~0.5-0.8 C; synthetic world
    # is easier (correctly-specified model) so demand < 0.6
    assert sc.mae.mean() < 0.6, f"LOO MAE {sc.mae.mean():.3f}"
    assert np.abs(sc.bias.mean()) < 0.1
    assert sc.r2.mean() > 0.9


def test_xval_infill_protocol(world):
    days = get_days_metadata("2015-01-01", "2015-12-31")
    S = world.n_stations
    truth = (
        world.stn_norm[np.arange(S)[:, None], days.month_idx[None, :]]
        + world.stn_anoms
    ).astype(np.float32)[:40]
    out = xval_infill(
        truth, days.month_idx, PPCAParams(n_components=8, n_neighbors=12),
        holdout_frac=0.2, stn_lon=world.stn_lon[:40], stn_lat=world.stn_lat[:40],
    )
    assert out["n_holdout"] > 2000
    assert out["mae"] < 1.5
    assert abs(out["bias"]) < 0.2


def test_loo_daily_xval(world):
    from topotpu.core.dates import get_days_metadata
    from topotpu.interp.xval import xval_interp_daily

    days = get_days_metadata("2015-01-01", "2015-12-31")
    out = xval_interp_daily(
        world.stn_lon, world.stn_lat, world.stn_elev, world.stn_tdi,
        world.stn_lst, world.stn_norm, _vario(world),
        np.ones((world.n_stations, 12), bool),
        world.stn_anoms.astype(np.float32), days.month_idx,
        InterpParams(k_neighbors=16),
    )
    # paper scale: daily x-val MAE ~1.2-2.0 C; synthetic anomalies are
    # strongly spatially correlated so demand < 2.0
    assert out["mae"] < 2.0, out["mae"]
    assert abs(out["bias"]) < 0.15
    assert out["rmse"] >= out["mae"]


def test_optimize_nnghs_returns_sane_choice(world):
    out = optimize_nnghs(
        world.stn_lon, world.stn_lat, world.stn_elev, world.stn_tdi,
        world.stn_lst, world.stn_norm, _vario(world),
        np.ones((world.n_stations, 12), bool),
        candidates=(8, 16, 32),
        region_labels=(world.stn_lat > world.stn_lat.mean()).astype(int),
    )
    assert set(out["best"]) == {0, 1}
    assert all(k in (8, 16, 32) for k in out["best"].values())


def test_optimize_nnghs_anoms_sweeps_daily_protocol(world):
    # The reference tunes the anomaly (GWR daily) neighborhood size with a
    # separate job from the normals one (SURVEY §2.16); the anomaly sweep
    # must score the DAILY protocol and respect ka <= k_neighbors.
    from topotpu.interp.xval import optimize_nnghs_anoms

    days = get_days_metadata("2015-01-01", "2015-12-31")
    out = optimize_nnghs_anoms(
        world.stn_lon, world.stn_lat, world.stn_elev, world.stn_tdi,
        world.stn_lst, world.stn_norm, _vario(world),
        np.ones((world.n_stations, 12), bool),
        world.stn_anoms.astype(np.float32), days.month_idx,
        candidates=(8, 16),
        region_labels=(world.stn_lat > world.stn_lat.mean()).astype(int),
        base_params=InterpParams(k_neighbors=16),
    )
    assert set(out["best"]) == {0, 1}
    assert all(k in (8, 16) for k in out["best"].values())
    assert all(v < 2.0 for v in out["mae"].values())
    # different ka really changes the daily fit
    assert out["mae"][8] != out["mae"][16]


def test_optimize_nnghs_survives_poisoned_station():
    """A station with a stale/NaN stored norm (BAD-flagged but still in the
    pool) must not poison candidate scoring: pre-fix, NaN errors made every
    candidate's score NaN and the argmin silently returned the FIRST
    candidate. Scores must stay finite and the pick must follow real MAE."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from topotpu.core.config import InterpParams
    from topotpu.interp.xval import optimize_nnghs
    from topotpu.io.synthetic import make_world

    rng = np.random.default_rng(3)
    world = make_world(rng, nrows=32, ncols=32, n_stations=40, ndays=31)
    nug, ps, rg = world.true_vario
    vario = np.tile(np.array([nug, ps, rg], np.float32), (40, 12, 1))
    norm = world.stn_norm.copy()
    norm[7] = np.nan
    res = optimize_nnghs(
        world.stn_lon, world.stn_lat, world.stn_elev, world.stn_tdi,
        world.stn_lst, norm, vario, np.ones((40, 12), bool),
        candidates=(8, 16, 24), region_labels=np.zeros(40, int),
        base_params=InterpParams(k_neighbors=16),
        parsimony=False,  # this test checks NaN-robust scoring vs argmin
    )
    maes = {k: float(v.mean()) for k, v in res["mae"].items()}
    assert all(np.isfinite(list(maes.values()))), maes

    def stn_score(v):  # per-station MAE aggregation, as optimize_nnghs scores
        e = np.abs(v)
        fin = np.isfinite(e)
        stn = np.where(fin, e, 0.0).sum(1) / np.maximum(fin.sum(1), 1)
        return float(stn[fin.any(1)].mean())

    scores = {k: stn_score(v) for k, v in res["per_station_err"].items()}
    assert res["best"][0] == min(scores, key=scores.get)


def test_pick_k_one_se_rule():
    """The 1-SE parsimony rule: smallest k within one standard error of the
    best mean MAE — a flat MAE curve (denser-than-needed network) must stop
    saturating at the largest candidate, while a genuinely better large k
    (gap >> SE) is still chosen."""
    from topotpu.interp.xval import _pick_k

    # flat curve: 48 is the argmin by a hair, well inside 8's error bar
    flat = {8: (0.402, 0.01), 16: (0.401, 0.01), 24: (0.4005, 0.01),
            32: (0.4002, 0.01), 48: (0.400, 0.01)}
    assert _pick_k(flat, 16, parsimony=True) == 8
    assert _pick_k(flat, 16, parsimony=False) == 48
    # decisive curve: the improvement dwarfs the SE -> parsimony agrees
    steep = {8: (0.80, 0.01), 16: (0.55, 0.01), 32: (0.40, 0.01)}
    assert _pick_k(steep, 16, parsimony=True) == 32
    assert _pick_k({}, 16, parsimony=True) == 16  # empty -> fallback


def test_optimize_nnghs_parsimony_not_structurally_max(world):
    """On a dense network with a short-range variogram, extra far neighbors
    add ~nothing — LOO-MAE alone still argmins at the largest candidate
    (more averaging always looks epsilon-better), which round-3 review
    called out as not-an-optimizer. The 1-SE pick must come in BELOW the
    max candidate here, and never above the argmin."""
    w = world
    S = w.n_stations
    nug, ps, rg = w.true_vario
    vario = np.tile(np.array([nug, ps, rg], np.float32), (S, 12, 1))
    out = optimize_nnghs(
        w.stn_lon, w.stn_lat, w.stn_elev, w.stn_tdi, w.stn_lst,
        w.stn_norm, vario, np.ones((S, 12), bool),
        candidates=(8, 16, 24, 32), region_labels=np.zeros(S, int),
    )
    assert out["best"][0] < 32, (
        "1-SE rule still saturated at the max candidate"
    )
