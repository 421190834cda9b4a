"""Station location QA.

Parity target: ``twx/qa/qa_location.py`` (SURVEY.md §2.6) — validate a
station's reported elevation against the DEM at its coordinates (the
reference also queried geonames; no network exists here, so the DEM check is
the implemented path and the geonames hook is an injectable callback).
"""

from __future__ import annotations

import numpy as np

from topotpu.io.rasters import RasterStack


def dem_elevation_at(rasters: RasterStack, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Nearest-cell DEM elevation at station coordinates (NaN off-grid)."""
    g = rasters.grid
    col = np.round((lon - g.lon0) / g.cellsize).astype(int)
    row = np.round((g.lat0 - lat) / g.cellsize).astype(int)
    ok = (row >= 0) & (row < g.nrows) & (col >= 0) & (col < g.ncols)
    out = np.full(len(lon), np.nan)
    out[ok] = rasters.elev[row[ok], col[ok]]
    return out


def check_elevation(
    rasters: RasterStack,
    lon: np.ndarray,
    lat: np.ndarray,
    elev: np.ndarray,
    max_diff_m: float = 200.0,
    lookup=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Flag stations whose reported elevation disagrees with the DEM.

    Returns (bad, dem_elev). ``lookup`` optionally overrides the DEM source
    (the reference's geonames web lookup slot).
    """
    dem = lookup(lon, lat) if lookup is not None else dem_elevation_at(rasters, lon, lat)
    with np.errstate(invalid="ignore"):
        bad = np.abs(dem - elev) > max_diff_m
    return np.nan_to_num(bad.astype(float)).astype(bool), dem


def fix_elevation(elev: np.ndarray, bad: np.ndarray, dem: np.ndarray) -> np.ndarray:
    """Replace flagged elevations with the DEM value (the reference's
    resolution for disagreeing stations)."""
    out = np.array(elev, copy=True)
    use = bad & np.isfinite(dem)
    out[use] = dem[use]
    return out
