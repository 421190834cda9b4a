"""Headline benchmark: grid cells/sec fully interpolated (kriged mean +
kriging variance for 12 monthly normals, plus 365 daily values) on the
available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "cells/sec", "vs_baseline": N}

Baseline semantics: the reference (jaredwo/topowx) publishes no throughput
numbers (BASELINE.md: `published: {}`); the driver's north-star target is
one full year of CONUS daily tmin+tmax at 30 arcsec (~1.3e7 land cells,
both variables) in under 10 minutes on a v5e-8. Per chip that is
    2 vars * 1.3e7 cells / 600 s / 8 chips ~= 5417 cells/sec/chip.
``vs_baseline`` is measured single-chip cells/sec divided by that per-chip
north-star rate, so vs_baseline >= 1.0 means the target is met.
"""

import json
import time

import numpy as np

NORTH_STAR_CELLS_PER_SEC_PER_CHIP = 2 * 1.3e7 / 600.0 / 8.0


def main():
    import jax

    from topotpu.core.config import InterpParams
    from topotpu.core.dates import get_days_metadata
    from topotpu.interp.point import interp_tile
    from topotpu.io.synthetic import make_world, tile_inputs_from_world

    # One production-shaped batch: 128x128-cell tile batch x4 = 65536 cells,
    # 512-station pool, k=32 neighborhoods, full year of dailies.
    n_cells = 65536
    side = 256
    n_stations = 512
    rng = np.random.default_rng(0)
    world = make_world(rng, nrows=side, ncols=side, n_stations=n_stations, ndays=365)
    days = get_days_metadata("2015-01-01", "2015-12-31")
    cells = np.arange(n_cells)
    rows, cols = np.unravel_index(cells, (side, side))
    ti, _ = tile_inputs_from_world(world, days.month_idx, rows, cols)

    params = InterpParams(k_neighbors=32)
    # synthetic stations are valid in all months -> single neighborhood
    # selection (the engine auto-detects the same condition in production)
    fn = jax.jit(lambda t: interp_tile(t, params, shared_validity=True))

    ti = jax.device_put(ti)
    res = jax.block_until_ready(fn(ti))  # compile + warm
    assert bool(np.isfinite(np.asarray(res.normal)).all())

    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        res = fn(ti)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / n_iter

    cells_per_sec = n_cells / dt
    out = {
        "metric": "grid cells/sec fully interpolated (12 monthly kriged normals "
        "+ variance + 365 daily GWR anomalies, k=32, single chip)",
        "value": round(cells_per_sec, 1),
        "unit": "cells/sec",
        "vs_baseline": round(cells_per_sec / NORTH_STAR_CELLS_PER_SEC_PER_CHIP, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
