"""Device mesh + sharding setup for data-parallel training over ICI.

The reference's NCCL process-group / DDP wiring (scripts/train_net.py:282-284,
utils/comm.py) maps to a 1-D jax mesh with a 'data' axis: one clip per chip,
gradient pmean compiled onto ICI collectives, eval gather done host-side.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices: Optional[list] = None) -> Mesh:
    """1-D data-parallel mesh. num_devices 0 = all local devices."""
    devs = devices if devices is not None else jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch with leading axis B = mesh size * per-chip batch."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
