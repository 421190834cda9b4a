"""PHA-equivalent homogenization: the C++ SNHT core must localize planted
steps and the network driver must attribute + remove them (and leave clean
stations untouched)."""

import numpy as np
import pytest

from topotpu.core.dates import get_days_metadata
from topotpu.homog.pha import detect_breaks, homogenize_network, monthly_means
from topotpu.io.synthetic import make_world


def test_detect_breaks_single_step(rng):
    T = 240
    x = rng.normal(0, 0.3, size=(1, T)).astype(np.float32)
    x[0, 150:] += 1.2
    breaks, stats = detect_breaks(x, minseg=24)
    found = breaks[0][breaks[0] >= 0]
    assert len(found) >= 1
    assert abs(found[0] - 150) <= 3
    assert stats[0, 0] > 9.0


def test_detect_breaks_handles_nan_and_clean(rng):
    T = 240
    clean = rng.normal(0, 0.3, size=(1, T)).astype(np.float32)
    b, _ = detect_breaks(clean, minseg=24)
    assert (b[0] == -1).all()

    x = rng.normal(0, 0.3, size=(1, T)).astype(np.float32)
    x[0, 100:] += 1.0
    x[0, ::7] = np.nan  # missing months
    b, _ = detect_breaks(x, minseg=24)
    found = b[0][b[0] >= 0]
    assert len(found) >= 1 and abs(found[0] - 100) <= 4


def test_detect_two_breaks(rng):
    T = 360
    x = rng.normal(0, 0.25, size=(1, T)).astype(np.float32)
    x[0, 120:] += 1.0
    x[0, 260:] -= 1.4
    b, _ = detect_breaks(x, minseg=24)
    found = np.sort(b[0][b[0] >= 0])
    assert len(found) >= 2
    assert min(abs(found - 120)) <= 5
    assert min(abs(found - 260)) <= 5


@pytest.fixture(scope="module")
def daily_network():
    rng = np.random.default_rng(31)
    ndays = 4383  # 2004-2015
    world = make_world(rng, nrows=40, ncols=40, n_stations=25, ndays=ndays)
    days = get_days_metadata("2004-01-01", "2015-12-31")
    S = world.n_stations
    daily = (
        world.stn_norm[np.arange(S)[:, None], days.month_idx[None, :]]
        + world.stn_anoms
    ).astype(np.float32)
    return world, days, daily


def test_homogenize_removes_planted_step(daily_network):
    world, days, daily = daily_network
    daily = daily.copy()
    # plant: station 3 was 1.5 C warmer before 2010-01-01 (e.g. site move)
    split = int(np.flatnonzero(days.ymd == 20100101)[0])
    daily[3, :split] += 1.5

    res = homogenize_network(
        daily, days.year, days.month, world.stn_lon, world.stn_lat,
    )
    # one break attributed to station 3 near month 72 (=6 years * 12)
    assert len(res.breakpoints[3]) >= 1
    b, est = res.breakpoints[3][0]
    assert abs(b - 72) <= 6
    assert abs(est - (-1.5)) < 0.35, f"step estimate {est}"

    # earlier segment pulled onto the reference (latest) level
    adj = res.adjustments[3]
    assert abs(adj[:60].mean() + 1.5) < 0.35
    assert abs(adj[80:].mean()) < 0.1

    # clean stations: essentially no adjustment
    others = [s for s in range(25) if s != 3]
    assert np.abs(res.adjustments[others]).max() < 0.5
    assert sum(len(res.breakpoints[s]) for s in others) <= 2

    # adjusted daily matches the truth (unstepped) series for station 3
    truth = daily[3].copy()
    truth[:split] -= 1.5
    mae = np.abs(res.adjusted_daily[3] - truth).mean()
    assert mae < 0.4


def test_monthly_means_sparse_guard(daily_network):
    world, days, daily = daily_network
    d = daily.copy()
    d[0, :200] = np.nan  # first months sparse
    monthly, keys = monthly_means(d, days.year, days.month)
    assert np.isnan(monthly[0, 0])
    assert len(keys) == 144
    assert np.isfinite(monthly[1]).all()
