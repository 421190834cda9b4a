"""Ground-truth spot check of a finished synthetic production run.

Regenerates the run's SyntheticWorld (same seed => bit-identical world;
cross-checked against the run's rasters.h5) and compares the mosaics
against the world's exact GP truth at sampled land cells:

  * monthly normals, ALL 12 months (winter months have different
    LST/inversion structure than the July-only checks of earlier rounds);
  * a handful of daily slices spread over the span, against
    true_normal + the noise-free synoptic anomaly field (anom_field_fn).

tmax's truth is tmin's + 10 C (step_synth_data generates tmax obs as
tmin + 10 + 1.5 C zero-mean noise).

Usage (after `topotpu.cli all` on the same config/grid/stations/seed):

    python examples/truth_check.py --config configs/config8.json \
        --grid 1024 --stations 4000 --seed 5 [--samples 2000]

Prints one JSON line per variable and exits nonzero if any month's
normals MAE exceeds --bar-normal or any daily slice exceeds --bar-daily.
"""

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--grid", type=int, required=True)
    ap.add_argument("--stations", type=int, required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ocean-frac", type=float, default=0.1)
    ap.add_argument("--samples", type=int, default=2000)
    ap.add_argument("--daily-slices", type=int, default=8)
    ap.add_argument("--bar-normal", type=float, default=0.6,
                    help="per-month normals MAE bar, C (paper band is "
                         "0.5-0.8 on real data; synthetic truth beats it)")
    ap.add_argument("--bar-daily", type=float, default=1.2,
                    help="per-slice daily MAE bar, C (paper daily x-val "
                         "band is 1.2-2.0)")
    ap.add_argument("--bar-z", type=float, default=3.0,
                    help="SE-calibration band: per-month std of "
                         "(normal error / kriging se) must lie in "
                         "[1/bar, bar] (1.0 = perfectly calibrated)")
    args = ap.parse_args()

    import h5py

    from topotpu.cli.steps import _days, _paths
    from topotpu.core.config import TopoConfig
    from topotpu.io.ncdf import decode_array
    from topotpu.io.rasters import RasterStack
    from topotpu.io.synthetic import make_world

    cfg = TopoConfig.load(args.config)
    p = _paths(cfg)
    days = _days(cfg)
    rng = np.random.default_rng(args.seed)
    world = make_world(rng, nrows=args.grid, ncols=args.grid,
                       n_stations=args.stations, ndays=days.ndays,
                       ocean_frac=args.ocean_frac)

    # same world as the run? (wrong seed/params would silently "fail" truth)
    rasters = RasterStack.load(p["rasters"])
    if not np.allclose(rasters.elev, world.elev, atol=1e-3):
        sys.exit("regenerated world does not match the run's rasters.h5 — "
                 "wrong --grid/--stations/--seed/--ocean-frac?")

    land_r, land_c = np.nonzero(world.landmask)
    pick = np.random.default_rng(123).choice(
        len(land_r), size=min(args.samples, len(land_r)), replace=False
    )
    rr, cc = land_r[pick], land_c[pick]
    lon, lat = world.grid.cell_lonlat(rr, cc)
    elev, tdi = world.elev[rr, cc], world.tdi[rr, cc]

    # noise-free anomaly truth at the sampled cells, all days (f32 to
    # bound memory at big sample counts)
    anom_truth = world.anom_field_fn(lon, lat).astype(np.float32)
    # The pipeline's "normal" is the per-month mean of the serially
    # complete dailies, so its truth is true_normal PLUS the span's
    # month-mean synoptic anomaly at that cell (the AR(1) synoptics are
    # zero-mean over the whole span, not per month — at 1-yr spans this
    # term is several C; at 69 yr it shrinks toward zero but is still the
    # correct comparison).
    month_mean_anom = np.stack(
        [anom_truth[:, days.month_idx == m].mean(axis=1) for m in range(12)],
        axis=0,
    )  # (12, N)

    day_picks = np.linspace(0, days.ndays - 1, args.daily_slices, dtype=int)
    failed = False
    for var, offset in (("tmin", 0.0), ("tmax", 10.0)):
        path = p[f"mosaic_{var}"]
        if not path.exists():
            print(json.dumps({"var": var, "status": "missing mosaic"}))
            failed = True
            continue
        norm_mae, norm_bias, z_std = [], [], []
        with h5py.File(path) as f:
            for m in range(12):
                plane = f["normal"][m]  # (R, C) f32
                est = plane[rr, cc]
                tru = world.true_normal(
                    lon, lat, elev, tdi, world.lst[m][rr, cc], m + 1
                ) + offset + month_mean_anom[m]
                d = est - tru
                fin = np.isfinite(d)
                norm_mae.append(float(np.abs(d[fin]).mean()))
                norm_bias.append(float(d[fin].mean()))
                # SE calibration: z = error / reported kriging se should be
                # O(1)-scaled if the variogram-derived variance is honest
                # (std(z) ~ 1 for exactly-calibrated Gaussian errors; the
                # pipeline's month-mean synoptic term and the f32 chain make
                # a within-factor-~bar_z band the meaningful check)
                se = f["se"][m][rr, cc]
                okz = fin & np.isfinite(se) & (se > 0)
                z_std.append(float(np.std(d[okz] / se[okz])))
            daily = {}
            dset = f[var]
            for t in day_picks:
                m = int(days.month_idx[t])
                raw = dset[int(t)]
                est = decode_array(raw[rr, cc], dset)
                tru = world.true_normal(
                    lon, lat, elev, tdi, world.lst[m][rr, cc], m + 1
                ) + offset + anom_truth[:, t]
                d = est - tru
                fin = np.isfinite(d)
                daily[str(days.date64[t])] = {
                    "mae": round(float(np.abs(d[fin]).mean()), 4),
                    "bias": round(float(d[fin].mean()), 4),
                    "n": int(fin.sum()),
                }
        worst_m = max(norm_mae)
        worst_d = max(v["mae"] for v in daily.values())
        worst_z = max(z_std)
        ok = (worst_m <= args.bar_normal and worst_d <= args.bar_daily
              and worst_z <= args.bar_z and min(z_std) >= 1.0 / args.bar_z)
        failed |= not ok
        print(json.dumps({
            "var": var,
            "status": "ok" if ok else "FAIL",
            "samples": len(rr),
            "normals_mae_by_month": [round(x, 4) for x in norm_mae],
            "normals_worst_month_mae": round(worst_m, 4),
            "normals_mean_bias": round(float(np.mean(norm_bias)), 4),
            "se_z_std_by_month": [round(x, 3) for x in z_std],
            "daily_slices": daily,
            "daily_worst_mae": round(worst_d, 4),
            "bars": {"normal": args.bar_normal, "daily": args.bar_daily,
                     "z": args.bar_z},
        }), flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
