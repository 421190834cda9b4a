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


def _dly_line_flags(sid, year, month, elem, slots):
    """Fixed-width .dly line with explicit per-day (value, mflag, qflag,
    sflag) 4-tuples; remaining days are -9999/blank."""
    line = f"{sid:<11}{year:04d}{month:02d}{elem:<4}"
    for d in range(31):
        v, mf, qf, sf = slots.get(d, (-9999, " ", " ", " "))
        line += f"{v:5d}{mf}{qf}{sf}"
    return line


def test_ghcn_flag_semantics():
    """Only QFLAG (failed NCEI QA) drops a value. MFLAG (measurement info,
    e.g. 'L' lagged) and SFLAG (source) are informational and must NOT —
    dropping on SFLAG would discard essentially the whole archive."""
    sid = "USC00012345"
    line = _dly_line_flags(sid, 2015, 3, "TMIN", {
        0: (15, " ", " ", " "),    # plain
        1: (20, "L", " ", "7"),    # lagged + source flag: keep
        2: (25, " ", "S", " "),    # QFLAG S (spatial fail): drop
        3: (30, "T", " ", "0"),    # MFLAG T (precip trace code): keep for temp
        4: (-9999, " ", "X", " "),  # missing beats any flag
    })
    ps = InsertGhcn({}).parse_dly(line)
    assert ps.tmin == {20150301: 1.5, 20150302: 2.0, 20150304: 3.0}


def test_ghcn_impossible_dates_dropped():
    """.dly lines always carry 31 slots; populated slots at impossible
    dates (Feb 30, Apr 31, Feb 29 off-leap) must not become observations."""
    sid = "USC00012345"
    feb15 = _dly_line(sid, 2015, 2, "TMIN", [10] * 31)   # 2015: 28 days
    feb16 = _dly_line(sid, 2016, 2, "TMIN", [10] * 31)   # 2016: leap
    apr = _dly_line(sid, 2015, 4, "TMIN", [10] * 31)
    ps = InsertGhcn({}).parse_dly("\n".join([feb15, feb16, apr]))
    assert 20150229 not in ps.tmin and 20150230 not in ps.tmin
    assert 20160229 in ps.tmin and 20160230 not in ps.tmin
    assert 20150431 not in ps.tmin and 20150430 in ps.tmin
    assert len(ps.tmin) == 28 + 29 + 30


def test_ghcn_interleaved_elements_and_duplicates():
    """Real .dly files interleave elements per month and are not
    month-sorted; a duplicated (month, element) line resolves LAST-wins,
    deterministically."""
    sid = "USC00012345"
    lines = [
        _dly_line(sid, 2015, 2, "TMAX", [100]),
        _dly_line(sid, 2015, 1, "PRCP", [999]),   # ignored element
        _dly_line(sid, 2015, 1, "TMIN", [11]),
        _dly_line(sid, 2015, 1, "TAVG", [55]),    # ignored element
        _dly_line(sid, 2015, 1, "TMAX", [90]),
        _dly_line(sid, 2015, 1, "TMIN", [22]),    # duplicate month: wins
    ]
    ps = InsertGhcn({}).parse_dly("\n".join(lines))
    assert ps.tmin == {20150101: 2.2}
    assert ps.tmax == {20150201: 10.0, 20150101: 9.0}


def test_inventory_missing_elev_and_relocation():
    """Inventory quirks: the documented -999.9 missing-elevation code must
    read as NaN (not a finite covariate!), and a station re-listed after a
    relocation resolves to the LAST entry."""
    sid = "USC00012345"
    l1 = f"{sid}  40.1000 -103.5000 -999.9 CO OLD SITE                      "
    l2 = f"{sid}  40.9000 -104.0000 1600.0 CO NEW SITE                      "
    inv = parse_ghcnd_stations("\n".join([l1, l2]))
    assert inv[sid]["lat"] == 40.9 and inv[sid]["elev"] == 1600.0

    inv1 = parse_ghcnd_stations(l1)
    assert np.isnan(inv1[sid]["elev"])


def test_build_db_screens_impossible_coordinates(tmp_path):
    """Finite-but-impossible coordinates (other networks' -999.9 style
    missing codes) must be screened like NaN at build time."""
    days = get_days_metadata("2015-01-01", "2015-12-31")
    vals = list(range(1, 32))
    text = "\n".join(
        _dly_line("USC00012345", 2015, m, "TMIN", vals) for m in range(1, 13)
    )
    bad = InsertGhcn(
        {"USC00012345": {"lat": -999.9, "lon": -103.0, "elev": 1000.0,
                         "state": "", "name": ""}}
    ).parse_dly(text)
    good = InsertGhcn(
        {"USC00012345": {"lat": 40.0, "lon": -103.0, "elev": 1000.0,
                         "state": "", "name": ""}}
    ).parse_dly(text)
    good.stn_id = "USC00099999"
    with build_station_db(tmp_path / "o.h5", [bad, good], days) as db:
        assert db.n_stations == 1
        assert db.stn(C.STN_ID)[0] == "USC00099999"
    # every station screened out: a clear error, not an opaque h5py one
    with pytest.raises(ValueError, match="no stations survived"):
        build_station_db(tmp_path / "o2.h5", [bad], days)


def test_delimited_edge_cases():
    """SNOTEL/RAWS exports: alternative missing tokens and impossible
    dates must be skipped, not parsed."""
    text = (
        "Date,TMIN,TMAX\n"
        "2015-02-30,32.0,50.0\n"      # impossible date
        "2015-06-01,M,77.0\n"          # 'M' missing code
        "2015-06-02,NA,NaN\n"
        "2015-06-03,41.0,59.0\n"
        "not-a-date,1,2\n"
    )
    ps = InsertSnotel().parse(text, "SNOTEL:301")
    assert 20150230 not in ps.tmin and 20150230 not in ps.tmax
    assert 20150601 not in ps.tmin and abs(ps.tmax[20150601] - 25.0) < 1e-9
    assert 20150602 not in ps.tmin and 20150602 not in ps.tmax
    assert abs(ps.tmin[20150603] - 5.0) < 1e-9


def test_ushcn_estimated_flag():
    """DMFLAG 'E' months are wholly FILNET-estimated; drop_estimated must
    exclude exactly those (default keeps them, like the reference's use)."""
    sid = "USH00011084"
    s = f"{sid} 2010"
    vals = [500 + m for m in range(12)]
    for m, v in enumerate(vals):
        dm = "E" if m in (2, 7) else " "
        s += f"{v:6d}{dm}  "
    kept = parse_ushcn_monthly(s)
    assert np.isfinite(kept[sid]["values"]).all()
    dropped = parse_ushcn_monthly(s, drop_estimated=True)
    v = dropped[sid]["values"][0]
    assert np.isnan(v[2]) and np.isnan(v[7])
    assert np.isfinite(np.delete(v, [2, 7])).all()


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


def test_iter_ghcnd_tar_matches_loose_files(tmp_path):
    """The NCEI distribution format: a (gzipped) tarball of per-station
    .dly members, streamed at constant memory — must parse identically to
    the same content as loose files, skipping non-.dly members."""
    import io
    import tarfile

    from topotpu.io.build_db import iter_ghcnd_tar

    sids = ["USC00012345", "USW00099999", "USC00054321"]
    inv = {
        s: {"lat": 39.0 + i, "lon": -104.0 - i, "elev": 1200.0 + i,
            "state": "CO", "name": f"S{i}"}
        for i, s in enumerate(sids)
    }
    texts = {}
    for i, sid in enumerate(sids):
        vals = [int(10 * (i + 3 + np.sin(d / 9.0))) for d in range(31)]
        lines = []
        for m in (1, 2, 3):
            lines.append(_dly_line(sid, 2015, m, "TMIN", vals))
            lines.append(_dly_line(sid, 2015, m, "TMAX",
                                   [v + 90 for v in vals]))
        texts[sid] = "\n".join(lines)

    tar_path = tmp_path / "ghcnd_all.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        for sid, text in texts.items():
            data = text.encode()
            ti = tarfile.TarInfo(f"ghcnd_all/{sid}.dly")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
        junk = b"not a dly"
        ti = tarfile.TarInfo("ghcnd_all/readme.txt")
        ti.size = len(junk)
        tf.addfile(ti, io.BytesIO(junk))

    from_tar = {ps.stn_id: ps for ps in iter_ghcnd_tar(tar_path, inv)}
    assert set(from_tar) == set(sids)
    for sid in sids:
        ref = InsertGhcn(inv).parse_dly(texts[sid])
        got = from_tar[sid]
        assert got.tmin == ref.tmin and got.tmax == ref.tmax
        assert (got.lat, got.lon, got.elev) == (ref.lat, ref.lon, ref.elev)

    # the CLI build-db stage ingests the archive when present
    import dataclasses

    from topotpu.cli.steps import step_build_db
    from topotpu.core.config import TopoConfig
    from topotpu.io.stndb import StationDB

    cfg = dataclasses.replace(
        TopoConfig(), data_dir=str(tmp_path),
        start_date="2015-01-01", end_date="2015-03-31",
    )
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "ghcnd_all.tar.gz").write_bytes(tar_path.read_bytes())
    inv_lines = [
        f"{s:<11} {inv[s]['lat']:8.4f} {inv[s]['lon']:9.4f} "
        f"{inv[s]['elev']:6.1f} {inv[s]['state']:<2} {inv[s]['name']:<30}"
        for s in sids
    ]
    (raw / "ghcnd-stations.txt").write_text("\n".join(inv_lines))
    step_build_db(cfg)
    with StationDB(tmp_path / "all_obs.h5") as db:
        assert db.n_stations == len(sids)


def test_iter_ushcn_tar(tmp_path):
    """USHCN distribution tarball (one FLs.52i member per station),
    streamed; must match parse_ushcn_monthly on the same text and skip
    non-station members."""
    import io
    import tarfile

    from topotpu.io.ushcn import iter_ushcn_tar

    def _line(sid, year, base):
        s = f"{sid} {year}"
        for m in range(12):
            s += f"{base + m:6d}   "
        return s

    texts = {
        "USH00011084": _line("USH00011084", 2010, 500),
        "USH00022222": _line("USH00022222", 2011, -300),
    }
    tar_path = tmp_path / "ushcn.tmax.latest.FLs.52i.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        for sid, text in texts.items():
            data = text.encode()
            ti = tarfile.TarInfo(f"ushcn.v2.5/{sid}.FLs.52i.tmax")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
        ti = tarfile.TarInfo("ushcn.v2.5/readme.txt")
        ti.size = 3
        tf.addfile(ti, io.BytesIO(b"hey"))

    got = dict(iter_ushcn_tar(tar_path))
    assert set(got) == set(texts)
    for sid, text in texts.items():
        ref = parse_ushcn_monthly(text)[sid]
        assert np.array_equal(got[sid]["years"], ref["years"])
        np.testing.assert_array_equal(got[sid]["values"], ref["values"])


def test_parsers_never_crash_on_garbage():
    """Raw-format parsers must degrade to 'no data', never raise, on
    arbitrary byte salad: truncated lines, binary junk, wrong widths,
    embedded NULs — the failure mode of a corrupted archive member."""
    import random

    from topotpu.io.build_db import InsertDelimited

    rnd = random.Random(7)
    alphabet = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,-+eE\t\x00\xff"
    )
    blobs = [""]
    for _ in range(200):
        n = rnd.randrange(0, 400)
        blobs.append("".join(rnd.choice(alphabet) for _ in range(n)))
    # adversarial near-misses: valid prefixes with corrupted tails
    base = _dly_line("USC00012345", 2015, 1, "TMIN", [15, -52])
    blobs += [base[:k] for k in (10, 20, 21, 60, 100, len(base) - 1)]
    blobs += [base.replace("TMIN", "TM\x00N"), base + "\x00garbage"]
    text = "\n".join(blobs)

    ps = InsertGhcn({}).parse_dly(text, stn_id="X")
    assert ps.tmin == {} and ps.tmax == {}
    inv = parse_ghcnd_stations(text)
    for a in inv.values():  # whatever parses must be screened-or-finite
        assert set(a) == {"lat", "lon", "elev", "state", "name"}
    parse_ushcn_monthly(text)
    InsertDelimited().parse(text, "JUNK", lat=40.0, lon=-100.0, elev=1.0)


def _toy_tar(tmp_path, sids, inv, gz=True):
    import io
    import tarfile

    tar_path = tmp_path / ("ghcnd_all.tar.gz" if gz else "ghcnd_all.tar")
    with tarfile.open(tar_path, "w:gz" if gz else "w") as tf:
        for i, sid in enumerate(sids):
            vals = [int(10 * (i + 3)) for _ in range(31)]
            text = "\n".join(
                _dly_line(sid, 2015, m, el, vals)
                for m in (1, 2) for el in ("TMIN", "TMAX")
            )
            data = text.encode()
            ti = tarfile.TarInfo(f"ghcnd_all/{sid}.dly")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    return tar_path


def test_iter_ghcnd_tar_truncated_raises_loudly(tmp_path):
    """An interrupted 3 GB download yields a short tarball; streaming it
    must raise an actionable error naming the archive and progress — NOT
    silently ingest the readable prefix as if it were the whole network."""
    import pytest

    from topotpu.io.build_db import iter_ghcnd_tar

    sids = [f"USC0001234{i}" for i in range(8)]
    inv = {s: {"lat": 39.0, "lon": -104.0, "elev": 1200.0} for s in sids}
    tar_path = _toy_tar(tmp_path, sids, inv, gz=True)
    whole = tar_path.read_bytes()
    cut = tmp_path / "cut" / "ghcnd_all.tar.gz"
    cut.parent.mkdir()
    cut.write_bytes(whole[: int(len(whole) * 0.6)])

    got = []
    with pytest.raises(RuntimeError, match="truncated or corrupt"):
        for ps in iter_ghcnd_tar(cut, inv):
            got.append(ps)
    assert len(got) < len(sids)  # it really was a partial read


def test_iter_ghcnd_tar_reconciles_against_inventory(tmp_path):
    """A clean pass reconciles parsed stations against the inventory:
    stations listed in ghcnd-stations.txt but absent from the archive are
    reported (partial mirror / mismatched vintage)."""
    from topotpu.io.build_db import iter_ghcnd_tar

    sids = [f"USC0002000{i}" for i in range(5)]
    inv = {s: {"lat": 40.0, "lon": -105.0, "elev": 1500.0} for s in sids}
    inv["USW00031313"] = {"lat": 41.0, "lon": -100.0, "elev": 900.0}
    inv["USW00032323"] = {"lat": 42.0, "lon": -101.0, "elev": 800.0}
    tar_path = _toy_tar(tmp_path, sids, inv)

    report = {}
    n = sum(1 for _ in iter_ghcnd_tar(tar_path, inv, report=report))
    assert n == 5
    assert report["members"] == 5 and report["stations"] == 5
    assert report["inventory_size"] == 7
    assert report["missing_from_archive"] == ["USW00031313", "USW00032323"]
