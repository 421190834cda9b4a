import numpy as np

from topotpu.core import constants as C
from topotpu.core.dates import get_days_metadata
from topotpu.io.build_db import (
    InsertGhcn,
    InsertSnotel,
    build_station_db,
    parse_ghcnd_stations,
)
from topotpu.io.download import DownloadUnavailable, fetch, ghcnd_station_url
from topotpu.io.ushcn import parse_ushcn_monthly
import pytest


def _dly_line(sid, year, month, elem, values, qflags=None):
    """Build one fixed-width .dly line; values in tenths C, None = missing."""
    line = f"{sid:<11}{year:04d}{month:02d}{elem:<4}"
    for d in range(31):
        v = values[d] if d < len(values) and values[d] is not None else -9999
        q = (qflags or {}).get(d, " ")
        line += f"{v:5d} {q} "
    return line


def test_parse_ghcnd_dly():
    sid = "USC00012345"
    lines = [
        _dly_line(sid, 2015, 1, "TMIN", [15, -52, None, 100], qflags={3: "X"}),
        _dly_line(sid, 2015, 1, "TMAX", [105, 88]),
        _dly_line(sid, 2015, 1, "PRCP", [10, 20]),  # ignored element
    ]
    inv = {sid: {"lat": 40.1, "lon": -103.5, "elev": 1500.0, "state": "CO", "name": "TEST"}}
    ps = InsertGhcn(inv).parse_dly("\n".join(lines))
    assert ps.stn_id == sid and ps.state == "CO"
    assert ps.tmin[20150101] == 1.5
    assert ps.tmin[20150102] == -5.2
    assert 20150103 not in ps.tmin          # missing
    assert 20150104 not in ps.tmin          # provider QA flag dropped
    assert ps.tmax[20150101] == 10.5
    assert len(ps.tmax) == 2


def test_parse_ghcnd_stations_inventory():
    line = (
        "USC00012345  40.1000 -103.5000 1500.0 CO TEST STATION NAME              "
    )
    inv = parse_ghcnd_stations(line)
    a = inv["USC00012345"]
    assert a["lat"] == 40.1 and a["lon"] == -103.5
    assert a["state"] == "CO"
    assert a["name"].startswith("TEST STATION")


def test_insert_snotel_fahrenheit():
    text = "Date,TMIN,TMAX\n2015-06-01,32.0,77.0\n2015-06-02,-99.9,50.0\nbadline\n"
    ps = InsertSnotel().parse(text, "SNOTEL:301", lat=43.0, lon=-110.0, elev=2500.0)
    assert abs(ps.tmin[20150601] - 0.0) < 1e-9     # 32F = 0C
    assert abs(ps.tmax[20150601] - 25.0) < 1e-9    # 77F = 25C
    assert 20150602 not in ps.tmin                  # missing sentinel
    assert abs(ps.tmax[20150602] - 10.0) < 1e-9


def test_build_station_db(tmp_path):
    days = get_days_metadata("2015-01-01", "2015-12-31")
    sid = "USC00012345"
    vals = [int(10 * (5 + np.sin(d / 10.0))) for d in range(31)]
    lines = []
    for m in range(1, 13):
        lines.append(_dly_line(sid, 2015, m, "TMIN", vals))
        lines.append(_dly_line(sid, 2015, m, "TMAX", [v + 100 for v in vals]))
    inv = {sid: {"lat": 40.0, "lon": -103.0, "elev": 1000.0, "state": "CO", "name": "A"}}
    ps = InsertGhcn(inv).parse_dly("\n".join(lines))
    sparse = InsertGhcn(inv).parse_dly(_dly_line("USC00000001", 2015, 1, "TMIN", [11]))

    p = tmp_path / "all_obs.h5"
    with build_station_db(p, [ps, sparse], days) as db:
        assert db.n_stations == 1  # sparse station screened out
        tmin = db.obs(C.TMIN)
        assert np.isfinite(tmin).sum() > 300
        # Feb 29/30/31 do not exist in the calendar -> parser drops them
        assert tmin.shape == (1, days.ndays)
        assert abs(tmin[0, 0] - vals[0] / 10.0) < 1e-6


def test_build_db_drops_stations_without_coordinates(tmp_path):
    """A .dly station absent from the inventory keeps NaN lon/lat; it must
    be dropped here or NaN distances would silently shrink neighborhoods."""
    days = get_days_metadata("2015-01-01", "2015-12-31")
    vals = list(range(1, 32))
    lines = [_dly_line("USC00099999", 2015, m, "TMIN", vals) for m in range(1, 13)]
    orphan = InsertGhcn({}).parse_dly("\n".join(lines))  # not in inventory
    assert not np.isfinite(orphan.lon)
    sid = "USC00012345"
    inv = {sid: {"lat": 40.0, "lon": -103.0, "elev": 1000.0, "state": "CO",
                 "name": "A"}}
    good = InsertGhcn(inv).parse_dly(
        "\n".join(_dly_line(sid, 2015, m, "TMIN", vals) for m in range(1, 13))
    )
    p = tmp_path / "all_obs.h5"
    with build_station_db(p, [orphan, good], days) as db:
        assert db.n_stations == 1
        assert db.stn(C.STN_ID)[0] == sid


def test_download_gated():
    url = ghcnd_station_url("USC00012345")
    assert url.endswith("USC00012345.dly")
    with pytest.raises(DownloadUnavailable):
        fetch(url, "/tmp/x.dly")

    # injectable opener works (simulated connected environment)
    import io, contextlib

    @contextlib.contextmanager
    def opener(u):
        yield io.BytesIO(b"HELLO")

    out = fetch(url, "/tmp/claude/x.dly", opener=opener)
    assert out.read_bytes() == b"HELLO"


def test_parse_ushcn():
    sid = "USH00011084"
    # build two year-lines with known values (hundredths C)
    def line(year, vals):
        s = f"{sid} {year:4d}"
        for v in vals:
            s += f"{v:6d}" + "   "
        return s

    text = line(2010, [500 + m for m in range(12)]) + "\n" + line(2011, [-9999] * 12)
    out = parse_ushcn_monthly(text)
    assert sid in out
    assert out[sid]["years"].tolist() == [2010, 2011]
    assert abs(out[sid]["values"][0, 0] - 5.00) < 1e-9
    assert np.isnan(out[sid]["values"][1]).all()
