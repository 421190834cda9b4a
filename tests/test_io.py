import numpy as np
import pytest

from topotpu.core.grid import GridSpec, Tiling
from topotpu.core.dates import get_days_metadata
from topotpu.io.ncdf import TileWriter, read_var
from topotpu.io.rasters import RasterStack
from topotpu.io.stndb import StationDB, write_serial_db
from topotpu.core import constants as C


@pytest.fixture
def grid():
    return GridSpec(lon0=-105.0, lat0=41.0, cellsize=1 / 120, nrows=10, ncols=12)


def test_tile_writer_roundtrip(tmp_path, grid, rng):
    days = get_days_metadata("2015-01-01", "2015-03-31")
    data = rng.normal(10, 8, size=(days.ndays, 10, 12)).astype(np.float32)
    data[:, 0, 0] = np.nan
    monthly = rng.normal(size=(12, 10, 12)).astype(np.float32)

    path = tmp_path / "tile.h5"
    with TileWriter(path, grid, days.date64) as w:
        w.write_daily("tmin", data)
        w.write_monthly("tmin_normal", monthly)
    assert path.exists() and not path.with_suffix(".h5.tmp").exists()

    back = read_var(path, "tmin")
    # int16 packing: quantization error bounded by scale/2
    span = np.nanmax(data) - np.nanmin(data)
    assert np.nanmax(np.abs(back - data)) <= span / 65500.0
    assert np.isnan(back[:, 0, 0]).all()
    np.testing.assert_allclose(read_var(path, "tmin_normal"), monthly, rtol=1e-6)

    # netCDF4-style structure: dimension scales attached
    import h5py

    with h5py.File(path) as f:
        assert f["tmin"].dims[0][0] == f["time"]
        assert f["tmin"].dims[1][0] == f["lat"]
        assert f.attrs["Conventions"] == "CF-1.6"


def test_tile_writer_atomic_on_error(tmp_path, grid):
    days = get_days_metadata("2015-01-01", "2015-01-31")
    path = tmp_path / "tile.h5"
    try:
        with TileWriter(path, grid, days.date64) as w:
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not path.exists()
    assert not path.with_suffix(".h5.tmp").exists()


def test_station_db_roundtrip(tmp_path, rng):
    days = get_days_metadata("2015-01-01", "2015-12-31")
    S, T = 5, days.ndays
    attrs = {
        C.STN_ID: np.array(["GHCND:US1", "GHCND:US2", "SNOTEL:A", "RAWS:B", "X"]),
        C.LON: rng.uniform(-110, -100, S),
        C.LAT: rng.uniform(30, 45, S),
        C.ELEV: rng.uniform(0, 3000, S),
    }
    obs = rng.normal(size=(S, T)).astype(np.float32)
    obs[0, :10] = np.nan
    p = tmp_path / "stndb.h5"
    with StationDB.create(p, attrs, days.date64) as db:
        db.set_obs("tmin", obs)
        db.set_qflags("tmin", np.zeros((S, T), np.uint8))

    with StationDB(p) as db:
        assert db.n_stations == S
        assert db.stn(C.STN_ID)[2] == "SNOTEL:A"
        np.testing.assert_allclose(db.stn(C.LAT), attrs[C.LAT])
        got = db.obs("tmin")
        np.testing.assert_array_equal(np.isnan(got), np.isnan(obs))
        np.testing.assert_allclose(got[~np.isnan(obs)], obs[~np.isnan(obs)])
        assert (db.dates == days.date64).all()

        # serial DB derivation
        filled = np.nan_to_num(obs)
        norms = rng.normal(size=(S, 12)).astype(np.float32)
        vario = rng.uniform(0.1, 2, size=(S, 12, 3)).astype(np.float32)
        sp = tmp_path / "serial.h5"
        write_serial_db(sp, db, "tmin", filled, norms,
                        bad=np.zeros(S, bool), vario=vario)

    with StationDB(sp) as sdb:
        np.testing.assert_allclose(sdb.stn(C.NORM), norms)
        np.testing.assert_allclose(sdb.stn(C.VARIO_RNG), vario[..., 2])
        assert np.isfinite(sdb.obs("tmin")).all()


def test_raster_stack_roundtrip(tmp_path, grid, rng):
    rs = RasterStack(
        grid=grid,
        elev=rng.uniform(0, 3000, (10, 12)).astype(np.float32),
        tdi=rng.normal(size=(10, 12)).astype(np.float32),
        lst=rng.normal(size=(12, 10, 12)).astype(np.float32),
        landmask=rng.uniform(size=(10, 12)) > 0.3,
    )
    p = tmp_path / "rasters.h5"
    rs.save(p)
    back = RasterStack.load(p)
    assert back.grid == grid
    np.testing.assert_array_equal(back.elev, rs.elev)
    np.testing.assert_array_equal(back.landmask, rs.landmask)
    e, t, l, m = back.tile_view(2, 3, 4, 5)
    np.testing.assert_array_equal(e, rs.elev[2:6, 3:8])
    assert l.shape == (12, 4, 5)


def test_tiling_land_tiles(grid):
    land = np.zeros((10, 12), bool)
    land[0:3, 0:3] = True
    tiling = Tiling(grid, tile_rows=4, tile_cols=4)
    tiles = list(tiling.land_tiles(land))
    assert len(tiles) == 1
    assert tiles[0].tile_id == 0
    # edge tile padding accounted
    all_tiles = list(tiling.tiles())
    last = all_tiles[-1]
    assert last.nrows + last.pad_rows == 4
    assert last.ncols + last.pad_cols == 4
