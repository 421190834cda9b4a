"""Profiling/tracing hooks.

Parity target: SURVEY.md §5 — the reference has nothing beyond StatusCheck;
the rebuild adds jax.profiler traces plus simple wall-time scopes keyed to
the BASELINE metric (cells/sec kriged).
"""

from __future__ import annotations

import contextlib
import json
import pathlib
import time


@contextlib.contextmanager
def device_trace(log_dir: str | pathlib.Path):
    """Capture a jax.profiler trace (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Named wall-time scopes with a cells/sec summary line."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self, n_cells: int | None = None) -> str:
        total = sum(self.times.values())
        out = {k: round(v, 3) for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])}
        line = {"total_s": round(total, 3), "scopes": out}
        if n_cells and total > 0:
            line["cells_per_sec"] = round(n_cells / total, 1)
        return json.dumps(line)
