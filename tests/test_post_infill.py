import numpy as np

from topotpu.core.dates import get_days_metadata
from topotpu.infill.post_infill import changepoint_flags


def test_changepoint_flags_imputation_artifact(rng):
    days = get_days_metadata("2006-01-01", "2015-12-31")
    T = days.ndays
    S = 3
    filled = rng.normal(0, 0.8, size=(S, T)).astype(np.float32)
    obs = np.ones((S, T), bool)

    # station 0: last 3 years fully imputed AND level-shifted (artifact)
    split = int(np.flatnonzero(days.ymd == 20130101)[0])
    obs[0, split:] = False
    filled[0, split:] += 2.5

    # station 1: same level shift but fully OBSERVED (a real break — not
    # this stage's business, the homogenizer owns it)
    filled[1, split:] += 2.5

    bad = changepoint_flags(filled, obs, days.year, days.month)
    assert bad[0]
    assert not bad[1]
    assert not bad[2]
