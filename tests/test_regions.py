"""Climate-region builder (geo.regions): the covariate-clustered stand-in
for the reference's rasterized US climate divisions (SURVEY §2.16)."""

import numpy as np

from topotpu.geo.regions import make_climate_regions
from topotpu.io.rasters import RasterStack
from topotpu.io.synthetic import make_world


def _rasters(seed=7, n=64):
    rng = np.random.default_rng(seed)
    world = make_world(rng, nrows=n, ncols=n, n_stations=30, ndays=31)
    return RasterStack.from_world(world)


def test_region_labels_cover_land_only():
    rs = _rasters()
    reg = make_climate_regions(rs, n_regions=8)
    assert reg.shape == rs.grid.shape
    assert reg.dtype == np.int32
    assert (reg[~rs.landmask] == -1).all()
    labels = np.unique(reg[rs.landmask])
    assert labels.min() >= 0
    # compacted labels: dense 0..n-1, every region nonempty
    assert np.array_equal(labels, np.arange(labels.size))
    assert 2 <= labels.size <= 8


def test_regions_deterministic_and_spatially_coherent():
    rs = _rasters()
    a = make_climate_regions(rs, n_regions=6, seed=3)
    b = make_climate_regions(rs, n_regions=6, seed=3)
    assert np.array_equal(a, b)

    # geography-led clustering: within-region latitude spread must be well
    # under the domain's spread (division-like blobs, not salt-and-pepper)
    rows, cols = np.nonzero(rs.landmask)
    _, lat = rs.grid.cell_lonlat(rows, cols)
    lab = a[rows, cols]
    within = np.mean(
        [lat[lab == j].std() for j in np.unique(lab) if (lab == j).sum() > 1]
    )
    assert within < 0.6 * lat.std()


def test_regions_degenerate_inputs():
    rs = _rasters()
    # more regions than distinct cells is clamped, not an error
    reg = make_climate_regions(rs, n_regions=10_000)
    assert (reg[rs.landmask] >= 0).all()
    # all-ocean grid
    rs.landmask[:] = False
    assert (make_climate_regions(rs, n_regions=4) == -1).all()


def test_sample_regions_snaps_ocean_stations_to_nearest_land():
    from topotpu.cli.steps import _sample_regions

    reg = np.full((6, 6), -1, np.int32)
    reg[0:3, 0:3] = 0
    reg[4:6, 4:6] = 1
    rows = np.array([1, 5, 3, 0])
    cols = np.array([1, 5, 3, 5])   # last two sit on unlabeled cells
    got = _sample_regions(reg, rows, cols)
    assert list(got[:2]) == [0, 1]       # labeled cells pass through
    assert got[2] in (0, 1)              # snapped to a nearest label
    assert got[3] in (0, 1)
    assert (got >= 0).all()

    # all-unlabeled raster: degenerate, labels stay -1 (one group)
    empty = np.full((4, 4), -1, np.int32)
    assert (_sample_regions(empty, rows[:1], cols[:1]) == -1).all()
