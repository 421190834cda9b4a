"""Multi-host (DCN) scale-out.

Parity target: the reference ran its mpi4py task farm across cluster nodes
(SURVEY.md §2 X1); the TPU-native equivalent is ``jax.distributed`` — one
controller process per host, a global mesh over all chips, tiles sharded
exactly as on one host (SURVEY §5 "DCN multi-host via
jax.distributed.initialize only at full-CONUS scale").

This container exposes a single chip, so this module is the (thin,
documented) hook rather than an exercised path: initialize() wires the
process group; global_mesh() builds the all-hosts mesh; the TileEngine works
unchanged on top because its inputs are host-local numpy and its sharded
step already declares per-array shardings.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from topotpu.dist.mesh import CELL_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize passthrough (env-var driven when args are
    None, matching JAX's TPU pod auto-configuration)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    """1-D cells mesh over every chip in the job (all hosts)."""
    return Mesh(np.array(jax.devices()), (CELL_AXIS,))


def is_coordinator() -> bool:
    return jax.process_index() == 0
