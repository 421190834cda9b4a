"""Mesh/shard_map layer: sharded result must equal single-device result and
the hot path must stay collective-free (the X1 design, SURVEY §2)."""

import numpy as np
import jax
import jax.numpy as jnp

from topotpu.core.config import InterpParams
from topotpu.core.dates import get_days_metadata
from topotpu.dist.mesh import make_mesh, sharded_interp_tile, shard_tile_inputs
from topotpu.interp.point import interp_tile
from topotpu.io.synthetic import make_world, tile_inputs_from_world


def _inputs():
    rng = np.random.default_rng(3)
    world = make_world(rng, nrows=16, ncols=16, n_stations=40, ndays=62)
    days = get_days_metadata("2015-01-01", "2015-12-31")
    rows, cols = np.unravel_index(np.arange(256), (16, 16))
    ti, _ = tile_inputs_from_world(world, days.month_idx[:62], rows, cols)
    return ti


def test_sharded_equals_single_device():
    params = InterpParams(k_neighbors=8)
    ti = _inputs()
    single = jax.jit(lambda t: interp_tile(t, params))(ti)

    mesh = make_mesh(8)
    fn = sharded_interp_tile(mesh, params)
    sharded = fn(shard_tile_inputs(mesh, ti))

    # BITWISE equality. Round 1 carried a 0.15 C max-abs allowance blamed
    # on shard_map trig vectorization; round-2 root-causing showed the
    # 0.066 C divergence came entirely from comparing against an EAGER
    # single-device reference (per-op evaluation reassociates the solve
    # chain differently than the fused jit program). Compiled-vs-compiled,
    # distances, neighborhoods, solves and dailies are all bit-identical
    # under sharding — verified across seeds {3,7,11} x k {8,16} x
    # shared_validity {on,off} on the 8-device mesh.
    for field in ("normal", "se", "daily", "vario"):
        np.testing.assert_array_equal(
            np.asarray(getattr(single, field)),
            np.asarray(getattr(sharded, field)),
            err_msg=field,
        )
    np.testing.assert_array_equal(np.asarray(single.ok), np.asarray(sharded.ok))


def test_hot_path_has_no_collectives():
    params = InterpParams(k_neighbors=8)
    ti = _inputs()
    mesh = make_mesh(8)
    fn = sharded_interp_tile(mesh, params)
    hlo = jax.jit(fn).lower(shard_tile_inputs(mesh, ti)).compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute", "reduce-scatter"):
        assert op not in hlo, f"unexpected collective {op} in hot path"


def test_uneven_mesh_sizes():
    params = InterpParams(k_neighbors=8)
    ti = _inputs()
    for n in (2, 4):
        mesh = make_mesh(n)
        fn = sharded_interp_tile(mesh, params)
        out = fn(shard_tile_inputs(mesh, ti))
        assert np.isfinite(np.asarray(out.normal)).all()


def test_multihost_helpers_single_process():
    """Single-process semantics of the DCN hooks: global mesh over all
    local devices, coordinator identity."""
    from topotpu.dist.multihost import global_mesh, is_coordinator

    mesh = global_mesh()
    assert mesh.devices.size == 8  # the virtual CPU mesh
    assert mesh.axis_names == ("cells",)
    assert is_coordinator()
