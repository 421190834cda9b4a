"""CLI smoke test: the full numbered pipeline on a tiny synthetic world
(every stage chained through the artifact files, like a user would run)."""

import json

from topotpu.cli.main import main
from topotpu.core.config import TopoConfig


def test_cli_full_pipeline(tmp_path, capsys):
    cfg = TopoConfig(
        data_dir=str(tmp_path / "data"),
        start_date="2015-01-01",
        end_date="2015-12-31",
        tile_rows=24,
        tile_cols=24,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.save(cfg_path)

    rc = main(["all", "--config", str(cfg_path), "--grid", "24",
               "--stations", "40"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    stages = [x["stage"] for x in lines]
    assert stages == ["synth-data", "qa", "homog", "infill", "krig-params",
                      "interp", "mosaic", "validate"]
    by = {x["stage"]: x["result"] for x in lines}
    assert by["interp"] == {"tmin": 1, "tmax": 1}
    assert by["validate"]["tmin"]["status"] == "ok"
    assert by["validate"]["tmax"]["status"] == "ok"
    assert (tmp_path / "data" / "mosaic_tmin.h5").exists()

    # packed tiles -> packed mosaic (int16, global scale); decode must
    # match the tile values to within the coarser quantization step
    import h5py
    import numpy as np

    from topotpu.io.ncdf import read_var

    with h5py.File(tmp_path / "data" / "mosaic_tmin.h5") as f:
        assert f["tmin"].dtype == np.int16
        g_scale = float(f["tmin"].attrs["scale_factor"])
    mosaic_daily = read_var(tmp_path / "data" / "mosaic_tmin.h5", "tmin")
    tile_daily = read_var(
        tmp_path / "data" / "tiles" / "tmin_tile00000.h5", "tmin"
    )
    fin = np.isfinite(tile_daily)
    assert np.array_equal(fin, np.isfinite(mosaic_daily[:, :24, :24]))
    assert (
        np.abs(mosaic_daily[:, :24, :24] - tile_daily)[fin].max()
        <= g_scale + 1e-6
    )

    rc = main(["xval-interp", "--config", str(cfg_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out["stage"] == "xval-interp"
    assert out["result"]["mae_mean"] < 1.5

    rc = main(["optim-nnghs", "--config", str(cfg_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out["stage"] == "optim-nnghs"
    assert out["result"]["best_k_by_region"]

    # region-raster input: quadrant labels on the run grid -> per-region k
    import h5py
    import numpy as np

    reg = np.zeros((24, 24), np.int32)
    reg[:12, 12:] = 1
    reg[12:, :12] = 2
    reg[12:, 12:] = 3
    reg_path = tmp_path / "regions.h5"
    with h5py.File(reg_path, "w") as f:
        f.create_dataset("regions", data=reg)
    rc = main(["optim-nnghs", "--config", str(cfg_path),
               "--regions", str(reg_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    got = set(out["result"]["best_k_by_region"])
    assert got <= {"0", "1", "2", "3"} and len(got) >= 2

    rc = main(["validate-f64", "--config", str(cfg_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out["stage"] == "validate-f64"
    assert out["result"]["tmin"]["within_parity_bar"] is True
    assert out["result"]["tmax"]["within_parity_bar"] is True


def test_reconcile_cross_variable(tmp_path):
    """Adversarial tmin/tmax: planted crossings are found, reconciled to the
    midpoint (mean-preserving), and everything else is untouched."""
    import h5py
    import numpy as np

    from topotpu.cli.steps import reconcile_cross_variable

    rng = np.random.default_rng(5)
    tmin = rng.normal(0, 5, (100, 8, 8)).astype(np.float32)
    tmax = tmin + 8.0
    tmin[3, 2, 2], tmax[3, 2, 2] = 10.0, 7.0    # crossing of 3.0 C
    tmax[40, 5, 1] = tmin[40, 5, 1] - 0.25      # sub-noise crossing
    tmin[7, 0, 0] = np.nan                       # masked cells stay masked
    tmax[9, 1, 1] = np.nan

    pn, px = tmp_path / "mosaic_tmin.h5", tmp_path / "mosaic_tmax.h5"
    with h5py.File(pn, "w") as f:
        f.create_dataset("tmin", data=tmin)
    with h5py.File(px, "w") as f:
        f.create_dataset("tmax", data=tmax)

    res = reconcile_cross_variable(pn, px, time_chunk=16)
    assert res["violations"] == 2
    assert abs(res["worst_crossing_C"] - 3.0) < 1e-6

    with h5py.File(pn) as f:
        a = f["tmin"][...]
    with h5py.File(px) as f:
        b = f["tmax"][...]
    assert abs(a[3, 2, 2] - 8.5) < 1e-6 and abs(b[3, 2, 2] - 8.5) < 1e-6
    fin = np.isfinite(a) & np.isfinite(b)
    assert (b[fin] >= a[fin]).all()
    assert np.isnan(a[7, 0, 0]) and np.isnan(b[9, 1, 1])
    # untouched elsewhere
    assert abs(b[50, 3, 3] - (a[50, 3, 3] + 8.0)) < 1e-6
