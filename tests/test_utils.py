import io
import json

import numpy as np

from topotpu.io.ushcn import compare_adjustments, parse_ushcn_monthly
from topotpu.utils.profiling import Timer
from topotpu.utils.status import StatusCheck


def test_status_check_reports_rate():
    out = io.StringIO()
    sc = StatusCheck(total=4, unit="tiles", items_per=100, out=out)
    for _ in range(4):
        sc.tick()
    text = out.getvalue()
    assert "4/4 tiles" in text
    assert "cells/s" in text
    assert sc.elapsed > 0


def test_timer_report():
    t = Timer()
    with t.scope("a"):
        sum(range(1000))
    with t.scope("b"):
        pass
    rep = json.loads(t.report(n_cells=100))
    assert set(rep["scopes"]) == {"a", "b"}
    assert rep["cells_per_sec"] > 0


def test_ushcn_compare_adjustments():
    sid = "USH00011084"
    line = f"{sid} 2010" + "".join(f"{500 + m:6d}   " for m in range(12))
    ushcn = parse_ushcn_monthly(line)
    ours = np.array([[5.0 + m / 100 + 0.1 for m in range(12)]])  # +0.1 off
    rmse = compare_adjustments(ours, np.array([2010]), ushcn, sid)
    assert abs(rmse - 0.1) < 1e-6
    assert np.isnan(compare_adjustments(ours, np.array([2010]), ushcn, "NOPE"))
    # no overlapping years
    assert np.isnan(
        compare_adjustments(ours, np.array([1999]), ushcn, sid)
    )
