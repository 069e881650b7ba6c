"""Multi-host coordination: barriers and object gather.

Replaces the reference's NCCL pickle-tensor machinery (utils/comm.py:40-152).
Inside the jitted step, collectives are jax.lax psum/pmean over the mesh; the
only HOST-side communication this framework needs is the evaluator's
prediction merge and barriers, which use jax.experimental.multihost_utils.
Single-process runs short-circuit to no-ops (the reference does the same when
world_size == 1, utils/comm.py:8-52).
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("stcat_barrier")


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather arbitrary picklable objects from all hosts (ref utils/comm.py:55-98)."""
    if get_world_size() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([payload.size]))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes())
        for i in range(gathered.shape[0])
    ]
