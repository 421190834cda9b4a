"""Headline benchmark: variable-cells/sec fully interpolated (kriged mean +
kriging variance for 12 monthly normals, plus 365 daily values, for BOTH
variables via the paired tmin+tmax step) on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "cells/sec", "vs_baseline": N}

Baseline semantics: the reference (jaredwo/topowx) publishes no throughput
numbers (BASELINE.md: `published: {}`); the driver's north-star target is
one full year of CONUS daily tmin+tmax at 30 arcsec (~1.3e7 land cells,
both variables) in under 10 minutes on a v5e-8. Per chip that is
    2 vars * 1.3e7 cells / 600 s / 8 chips ~= 5417 cells/sec/chip.
The north star counts variable-cells (2 per grid cell), so the benchmark
runs the production-shaped PAIRED step (tmin+tmax sharing neighborhoods /
gains / scatter, interp.point.interp_tile_pair) and reports
2 * cells / step-time. ``vs_baseline`` is that single-chip rate divided by
the per-chip north-star rate, so vs_baseline >= 1.0 means the target is
met. (Round-2 ladder: 103.5k solo-variable -> 134.5k paired -> ~850k with
the single-table neighborhood gather; see RESULTS.md.)
"""

import json
import time

import numpy as np

NORTH_STAR_CELLS_PER_SEC_PER_CHIP = 2 * 1.3e7 / 600.0 / 8.0


def _wait_for_backend(max_wait_s: float = 600.0, poll_s: float = 30.0):
    """Retry backend init for a bounded window. The tunneled-TPU relay can
    drop transiently (observed mid-round: the relay daemon restarting makes
    every init raise Unavailable for a few minutes); a benchmark that dies
    on the first such failure produces no artifact at all, which is worse
    than a late one."""
    import os
    import socket
    import time as _t

    import jax

    deadline = _t.time() + max_wait_s

    def _relay_up() -> bool:
        # The axon PJRT client dials the tunnel relay on localhost (the
        # relay binds a fixed port set; 8082 is the first). When the relay
        # daemon is down, backend init BLOCKS inside the plugin instead of
        # raising — so probe the socket first and only touch jax once the
        # relay is actually listening.
        if not os.environ.get("PALLAS_AXON_POOL_IPS"):
            return True  # not the tunneled-TPU environment (e.g. CPU CI)
        s = socket.socket()
        s.settimeout(2.0)
        try:
            s.connect(("127.0.0.1", 8082))
            return True
        except OSError:
            return False
        finally:
            s.close()

    while True:
        # re-probe the socket before EVERY init attempt: the relay can die
        # between a raising attempt and the retry, and init against a dead
        # relay BLOCKS forever — failing fast beats hanging the harness
        while not _relay_up():
            if _t.time() >= deadline:
                raise RuntimeError(
                    "axon relay tunnel not listening on 127.0.0.1:8082 "
                    f"after {max_wait_s:.0f}s — TPU transport is down; "
                    "rerun once the tunnel is restored"
                )
            print("# axon relay not listening; waiting for the tunnel",
                  flush=True)
            _t.sleep(poll_s)
        try:
            return jax.devices()
        except Exception as e:  # init failures surface as RuntimeError
            if _t.time() >= deadline:
                raise
            print(f"# backend unavailable ({type(e).__name__}); retrying: {e}",
                  flush=True)
            # jax caches a failed plugin init for the life of the process;
            # clear it so the next attempt actually re-dials the relay
            try:
                from jax._src import xla_bridge as _xb

                _xb._clear_backends()
                _xb._backend_errors.clear()
            except Exception:
                pass
            _t.sleep(poll_s)


def _trace_summary(log_dir) -> dict:
    """Aggregate a jax.profiler perfetto trace into a device-time breakdown
    {event name: total ms}, top events first. The trace lands under
    <log_dir>/plugins/profile/<run>/*.trace.json.gz (perfetto JSON); device
    lanes are the track names carrying XLA op events."""
    import gzip
    import pathlib

    files = sorted(
        pathlib.Path(log_dir).glob("plugins/profile/*/*.trace.json.gz")
    )
    if not files:
        return {"error": f"no trace.json.gz produced under {log_dir}"}
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    by_name: dict[str, float] = {}
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        by_name[name] = by_name.get(name, 0.0) + ev["dur"] / 1e3  # us -> ms
        total += ev["dur"] / 1e3
    top = dict(sorted(by_name.items(), key=lambda kv: -kv[1])[:15])
    return {
        "trace_file": str(files[-1]),
        "total_event_ms": round(total, 2),
        "top_events_ms": {k: round(v, 2) for k, v in top.items()},
    }


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true",
                    help="capture a jax.profiler trace of the timed step "
                         "and print a device-time breakdown")
    ap.add_argument("--trace-dir", default=".trace")
    ap.add_argument("--trace-out", default="docs/trace_budget.json",
                    help="write the aggregated device-time breakdown here "
                         "(checked-in artifact: keeps the docs/kernels.md "
                         "budget table re-checkable against a file)")
    args = ap.parse_args()

    _wait_for_backend()

    from topotpu.core.config import InterpParams
    from topotpu.core.dates import get_days_metadata
    from topotpu.interp.point import (
        PairTileInputs,
        VarFields,
        interp_tile_pair,
    )
    from topotpu.io.synthetic import make_world, tile_inputs_from_world

    # One production-shaped batch: 128x128-cell tile batch x4 = 65536 cells,
    # 512-station pool, k=32 neighborhoods, full year of dailies, BOTH
    # variables (tmin + a tmax-like sibling) through the paired step.
    n_cells = 65536
    side = 256
    n_stations = 512
    rng = np.random.default_rng(0)
    world = make_world(rng, nrows=side, ncols=side, n_stations=n_stations, ndays=365)
    days = get_days_metadata("2015-01-01", "2015-12-31")
    cells = np.arange(n_cells)
    rows, cols = np.unravel_index(cells, (side, side))
    ti, _ = tile_inputs_from_world(world, days.month_idx, rows, cols)
    pair = PairTileInputs(
        geom=ti,
        b=VarFields(
            norm=ti.stn_norm + 9.0,
            vario=ti.stn_vario,
            anoms=ti.stn_anoms * 0.85,
        ),
    )

    params = InterpParams(k_neighbors=32)
    # synthetic stations are valid in all months -> single neighborhood
    # selection (the engine auto-detects the same condition in production)
    fn = jax.jit(lambda p: interp_tile_pair(p, params, shared_validity=True))

    pair = jax.device_put(pair)
    res_a, res_b = jax.block_until_ready(fn(pair))  # compile + warm
    assert bool(np.isfinite(np.asarray(res_a.normal)).all())
    assert bool(np.isfinite(np.asarray(res_b.normal)).all())

    if args.trace:
        # VERDICT r3: turn the headline rate into an attributed budget —
        # capture a profiler trace of two production-shaped steps and
        # print the device-time breakdown (goes into docs/kernels.md)
        from topotpu.utils.profiling import device_trace

        with device_trace(args.trace_dir):
            for _ in range(2):
                res = fn(pair)
            jax.block_until_ready(res)
        summary = _trace_summary(args.trace_dir)
        print("# trace_summary:", json.dumps(summary), flush=True)
        if args.trace_out:
            # retained artifact (VERDICT r4 weak #5): the raw perfetto
            # .trace/ dir is gitignored scratch; this aggregated JSON is
            # the checked-in residue the kernels.md budget table cites
            import pathlib as _pl

            outp = _pl.Path(args.trace_out)
            outp.parent.mkdir(parents=True, exist_ok=True)
            outp.write_text(json.dumps(
                {"protocol": "bench.py --trace: 2 paired production steps, "
                             "65536 cells, k=32, 512 stations, 365 days, "
                             "both variables", **summary}, indent=2))

    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        res = fn(pair)
    jax.block_until_ready(res)
    dt_async = (time.perf_counter() - t0) / n_iter

    # Readback-verified timing (the CLAUDE.md rule: block_until_ready is
    # unreliable over the tunneled device link): each step additionally
    # forces a 1-element device->host fetch of the result, and the measured
    # per-probe RPC baseline (device slice + fetch of a warm array, same
    # op sequence) is subtracted. The HEADLINE value is this number; the
    # async one is reported alongside so the delta stays visible.
    probe_src = res_a.normal  # already-computed warm array
    float(np.asarray(probe_src[0, 0]))  # warm the probe program
    n_rpc = 10
    t0 = time.perf_counter()
    for _ in range(n_rpc):
        float(np.asarray(probe_src[0, 0]))
    rpc_baseline = (time.perf_counter() - t0) / n_rpc

    t0 = time.perf_counter()
    for _ in range(n_iter):
        res_a2, _ = fn(pair)
        float(np.asarray(res_a2.normal[0, 0]))  # forces full completion
    dt_rb = max((time.perf_counter() - t0) / n_iter - rpc_baseline, 1e-9)

    rate_rb = 2 * n_cells / dt_rb
    rate_async = 2 * n_cells / dt_async
    out = {
        "metric": "variable-cells/sec fully interpolated (12 monthly kriged "
        "normals + variance + 365 daily GWR anomalies for BOTH variables "
        "via the paired tmin+tmax step, k=32, single chip; readback-timed, "
        "RPC baseline subtracted)",
        "value": round(rate_rb, 1),
        "unit": "cells/sec",
        "vs_baseline": round(rate_rb / NORTH_STAR_CELLS_PER_SEC_PER_CHIP, 3),
        "value_async": round(rate_async, 1),
        "rpc_baseline_ms": round(rpc_baseline * 1e3, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
