"""QA suite tests: each check must catch planted defects and leave clean
data unflagged (the reference validated its port against GHCN-D published
flags; here the oracle is defect injection on synthetic data)."""

import numpy as np
import pytest

from topotpu.core import constants as C
from topotpu.core.dates import get_days_metadata
from topotpu.io.synthetic import make_world
from topotpu.qa import run_qa_non_spatial, run_qa_spatial, check_elevation
from topotpu.io.rasters import RasterStack


@pytest.fixture(scope="module")
def network():
    rng = np.random.default_rng(13)
    world = make_world(rng, nrows=40, ncols=40, n_stations=30, ndays=1461)
    days = get_days_metadata("2012-01-01", "2015-12-31")
    S = world.n_stations
    tmin = (
        world.stn_norm[np.arange(S)[:, None], days.month_idx[None, :]]
        + world.stn_anoms
    ).astype(np.float32)
    tmax = tmin + 10.0 + 1.5 * rng.standard_normal(tmin.shape).astype(np.float32)
    return world, days, tmin, tmax


def test_clean_data_mostly_unflagged(network):
    world, days, tmin, tmax = network
    ft, fx = run_qa_non_spatial(tmin, tmax, days)
    # clean synthetic data: < 0.1% false positives
    assert (ft != C.QA_OK).mean() < 1e-3
    assert (fx != C.QA_OK).mean() < 1e-3


def test_planted_defects_caught(network):
    world, days, tmin, tmax = network
    tmin = tmin.copy()
    tmax = tmax.copy()

    tmin[0, 100] = 99.0                      # world record
    tmax[1, 200] = -120.0
    tmin[2, 300:330] = 5.0                   # 30-day streak
    tmin[3, 400] = tmax[3, 400] + 5.0        # tmax < tmin
    tmax[4, 500] += 30.0                     # spike vs both neighbors
    # duplicated year: copy 2012 into 2013 date-aligned (month/day), the way
    # a real duplication happens; 2012 is a leap year, so a positional copy
    # would shift every post-February day by one calendar date
    y13 = days.year == 2013
    slot = (days.month - 1) * 31 + (days.day - 1)
    src_of_slot = {slot[i]: i for i in np.flatnonzero(days.year == 2012)}
    for i in np.flatnonzero(y13):
        tmin[5, i] = tmin[5, src_of_slot[slot[i]]]

    ft, fx = run_qa_non_spatial(tmin, tmax, days)
    assert ft[0, 100] == C.QA_IMPOSS_VALUE
    assert fx[1, 200] == C.QA_IMPOSS_VALUE
    assert (ft[2, 300:330] == C.QA_STREAK).all()
    assert ft[3, 400] == C.QA_INTERNAL and fx[3, 400] == C.QA_INTERNAL
    assert fx[4, 500] in (C.QA_SPIKE_DIP, C.QA_CLIM_OUTLIER, C.QA_GAP)
    assert (ft[5, y13] == C.QA_DUP_YEAR).sum() > 300
    # untouched stations stay clean
    assert (ft[10:] != C.QA_OK).mean() < 1e-3


def test_monotone_ramp_not_flagged_as_spike():
    """Durre's spike/dip requires the excursion to oppose BOTH neighbors;
    a steep monotone ramp (e.g. a >25C/day frontal passage over two days)
    must not be flagged, while true spikes/dips still are."""
    from topotpu.qa.qa_temp import check_spike_dip

    obs = np.zeros((1, 9), np.float32)
    obs[0] = [0.0, 26.0, 52.0, 52.0, 52.0, 80.0, 52.0, 52.0, 24.0]
    #          ramp up x2 ------------^     spike^            ^dip (-28 both)
    flags = np.full(obs.shape, C.QA_OK, np.uint8)
    check_spike_dip(obs, flags)
    assert flags[0, 1] == C.QA_OK and flags[0, 2] == C.QA_OK  # monotone ramp
    assert flags[0, 5] == C.QA_SPIKE_DIP                      # true spike
    assert flags[0, 8] == C.QA_OK  # series edge: no next neighbor
    obs2 = np.array([[50.0, 50.0, 20.0, 50.0, 50.0]], np.float32)
    flags2 = np.full(obs2.shape, C.QA_OK, np.uint8)
    check_spike_dip(obs2, flags2)
    assert flags2[0, 2] == C.QA_SPIKE_DIP                     # true dip


def test_spatial_regression_catches_isolated_error(network):
    world, days, tmin, _ = network
    tmin = tmin.copy()
    ft = np.full(tmin.shape, C.QA_OK, np.uint8)
    # a 15C error on one day at one station, neighbors normal
    tmin[7, 600] += 15.0
    ft = run_qa_spatial(tmin, ft, world.stn_lon, world.stn_lat, days,
                        max_dist_km=300.0)
    assert ft[7, 600] == C.QA_SPATIAL_REGRESS
    # the same-day values at other stations survive
    assert (ft[:, 600] != C.QA_OK).sum() <= 2


def test_elevation_check(network):
    world, _, _, _ = network
    rasters = RasterStack.from_world(world)
    elev = world.stn_elev.copy()
    elev[3] += 1500.0  # wrong by 1.5 km
    bad, dem = check_elevation(rasters, world.stn_lon, world.stn_lat, elev)
    assert bad[3]
    assert bad.sum() == 1
    from topotpu.qa.qa_location import fix_elevation

    fixed = fix_elevation(elev, bad, dem)
    assert abs(fixed[3] - world.stn_elev[3]) < 60.0


def test_biweight_rows_matches_reference():
    """The vectorized sort-based biweight (clim-outlier fast path) must
    reproduce the original nanmedian-based estimator exactly."""
    from topotpu.qa.qa_temp import _biweight, _biweight_rows

    rng = np.random.default_rng(3)
    x = rng.normal(5.0, 4.0, (40, 217)).astype(np.float64)
    x[rng.random(x.shape) < 0.2] = np.nan
    x[0] = np.nan                      # all-missing row
    x[1, 10:] = np.nan                 # nearly-empty row
    m_ref, s_ref = _biweight(x, axis=1)
    m_new, s_new, cnt = _biweight_rows(x)
    ok = np.isfinite(m_ref)
    np.testing.assert_allclose(m_new[ok], m_ref[ok], rtol=0, atol=1e-12)
    np.testing.assert_allclose(s_new[ok], s_ref[ok], rtol=0, atol=1e-12)
    assert cnt[0] == 0
    assert np.array_equal(cnt, np.isfinite(x).sum(1))


def test_duplicate_hash_matmul_exactness():
    """_duplicate_pairs must find exactly the planted duplicates — including
    a pair that agrees only on the common observed subset — and reject
    near-duplicates differing in a single slot (the integer-exact matmul
    identity cannot round that away)."""
    from topotpu.qa.qa_temp import _duplicate_pairs

    rng = np.random.default_rng(11)
    A = rng.normal(0, 8, (3, 6, 372)).astype(np.float32)
    A[:, :, rng.random(372) < 0.2] = np.nan
    # station 0: years 1 and 4 identical on the intersection, with
    # DIFFERENT observation masks (year 4 missing a chunk year 1 has)
    A[0, 4] = A[0, 1]
    A[0, 4, 50:120] = np.nan
    # station 1: years 2/5 equal except ONE slot differs by one ulp-ish step
    A[1, 5] = A[1, 2]
    A[1, 5, 200] = A[1, 2, 200] + np.float32(1e-4)
    got = _duplicate_pairs(A, min_common=100)
    assert (0, 1, 4) in got
    assert all(not (s == 1 and i == 2 and j == 5) for s, i, j in got)


def test_coordinate_sanity_probes(network):
    """Offline geonames replacement: planted coordinate corruptions
    (lon/lat transposed, longitude sign dropped) must be flagged AND
    attributed, with the repair recovered; clean stations stay unflagged."""
    from topotpu.qa.qa_location import check_coordinates

    world, _, _, _ = network
    rasters = RasterStack.from_world(world)
    lon = world.stn_lon.copy().astype(float)
    lat = world.stn_lat.copy().astype(float)
    lon[4], lat[4] = lat[4], lon[4]      # transposed entry
    lon[9] = -lon[9]                     # western lon entered positive
    out = check_coordinates(rasters, lon, lat, world.stn_elev)
    assert out["suspect"][4] and out["suspect"][9]
    assert out["suspect"].sum() == 2
    assert out["probe"][4] == "lonlat_swapped"
    assert out["probe"][9] == "lon_sign"
    assert abs(out["fix_lon"][4] - world.stn_lon[4]) < 1e-9
    assert abs(out["fix_lat"][4] - world.stn_lat[4]) < 1e-9
    assert abs(out["fix_lon"][9] - world.stn_lon[9]) < 1e-9
