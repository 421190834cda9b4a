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

    rc = main(["validate-f64", "--config", str(cfg_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out["stage"] == "validate-f64"
    assert out["result"]["tmin"]["within_parity_bar"] is True
    assert out["result"]["tmax"]["within_parity_bar"] is True
