"""Device mesh + sharding helpers.

The reference has no distributed backend of any kind (SURVEY.md §6.8 [CODE]).
This module is the build's entire "communication layer": a mesh constructor and
named shardings; all actual communication is XLA collectives inserted from
`shard_map`/`NamedSharding` annotations (psum / argmax reductions over ICI —
SURVEY.md §3.3).  Testable on faked CPU devices (conftest forces 8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: Mesh axis over which independent scenario LPs are sharded (pure DP).
BATCH_AXIS = "data"
#: Mesh axis over which the columns of A are sharded for parallel pricing (TP).
COL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 2-D ('data', 'model') mesh; defaults to all devices on the data axis."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devs.size // n_model
    if n_data * n_model != devs.size:
        raise ValueError(
            f"mesh {n_data}x{n_model} does not cover {devs.size} devices"
        )
    return Mesh(devs.reshape(n_data, n_model), (BATCH_AXIS, COL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (scenario batch) sharding: pure data parallelism."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def column_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the last (column) axis of a matrix over the model axis."""
    return NamedSharding(mesh, P(None, COL_AXIS))
