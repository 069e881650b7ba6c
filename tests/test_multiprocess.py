"""2-process distributed test on CPU: loader shard disjointness, multi-host
batch assembly (host_local_array_to_global_array), in-step psum equivalence,
and the evaluator's host-side object gather.

Mirrors the reference's DistributedSampler + NCCL all_gather capability
(datasets/build.py:85-92, utils/comm.py:55-98) without a cluster:
two subprocesses each with 2 virtual CPU devices, coordinated via
jax.distributed.initialize.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, pickle
import numpy as np

proc_id = int(sys.argv[1]); port = sys.argv[2]
import jax
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=proc_id
)
# must run before the first backend query: the axon TPU plugin registers
# itself even under JAX_PLATFORMS=cpu and reports process_count() == 1
jax.config.update("jax_platform_name", "cpu")
assert jax.process_count() == 2
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

sys.path.insert(0, os.environ["STCAT_REPO"])
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stcat_tpu.core.dist import all_gather_objects, synchronize
from stcat_tpu.core.mesh import DATA_AXIS, make_mesh, shard_batch

mesh = make_mesh()  # all 4 global devices

# --- multi-host batch assembly: each host holds its 2-row local shard ---
local = np.arange(6, dtype=np.float32).reshape(2, 3) + 100 * proc_id
arr = shard_batch({"x": local}, mesh)["x"]
assert arr.shape == (4, 3), arr.shape  # global leading axis

@jax.jit
def total(a):
    return jnp.sum(a)

# sum over the GLOBAL batch must see both hosts' rows: 2*15 + 100*3*2
got = float(total(arr))
assert got == 15.0 + 15.0 + 100 * 6, got

# --- loader shard disjointness across processes ---
from stcat_tpu.data.loader import Loader
from stcat_tpu.config import default_config, merge_from_list
cfg = merge_from_list(default_config(), ["TPU.FRAME_BUCKETS", "[4]", "SOLVER.MAX_EPOCH", 1])

class FakeDataset:
    def __len__(self):
        return 8
    def __getitem__(self, index, rng=None):
        t = 4
        return {
            "frames": np.zeros((t, 8, 8, 3), np.float32),
            "boxes_cxcywh": np.asarray([[0.5, 0.5, 0.2, 0.2]] * 2, np.float32),
            "actioness": np.asarray([0, 1, 1, 0], np.float32),
            "text": "x", "item_id": index,
            "frame_ids": list(range(t)), "ori_size": (8, 8),
        }

loader = Loader(cfg, FakeDataset(), global_batch=2, is_train=True,
                num_workers=1, shard_index=jax.process_index(),
                num_shards=jax.process_count())
mine = sorted(int(i) for i in loader._epoch_indices(0)[0])

# --- host-side object gather (evaluator merge path) ---
synchronize()
gathered = all_gather_objects({"rank": proc_id, "indices": mine})
assert len(gathered) == 2
all_indices = sorted(i for g in gathered for i in g["indices"])
assert all_indices == list(range(8)), all_indices
assert set(gathered[0]["indices"]).isdisjoint(gathered[1]["indices"])
print(f"WORKER_{proc_id}_OK")
"""


TRAIN_WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1]); port = sys.argv[2]; workdir = sys.argv[3]
import jax
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=proc_id
)
jax.config.update("jax_platform_name", "cpu")
assert jax.process_count() == 2 and len(jax.devices()) == 4

sys.path.insert(0, os.environ["STCAT_REPO"])
from stcat_tpu.config import default_config, merge_from_list
from stcat_tpu.core.dist import all_gather_objects, is_main_process, synchronize
from stcat_tpu.data.synthetic import make_synthetic_dataset, write_synthetic_cache
from stcat_tpu.train.loop import train

data_dir = os.path.join(workdir, "data")
out_dir = os.path.join(workdir, "out")
cfg = merge_from_list(default_config(), [
    "DATA_DIR", data_dir, "OUTPUT_DIR", out_dir, "DATASET.NAME", "VidSTG",
    "INPUT.RESOLUTION", 32, "INPUT.TRAIN_SAMPLE_NUM", 4,
    "INPUT.MAX_QUERY_LEN", 8, "INPUT.MAX_VIDEO_LEN", 16,
    "MODEL.VISION_BACKBONE.DEPTHS", "[1,1,1,1]",
    "MODEL.STCAT.ENC_LAYERS", 1, "MODEL.STCAT.DEC_LAYERS", 1,
    "MODEL.STCAT.HIDDEN", 64, "MODEL.STCAT.HEADS", 4,
    "MODEL.STCAT.FFN_DIM", 64,
    "MODEL.TEXT_MODEL.VOCAB_SIZE", 256, "MODEL.TEXT_MODEL.HIDDEN", 32,
    "MODEL.TEXT_MODEL.LAYERS", 1, "MODEL.TEXT_MODEL.HEADS", 2,
    "MODEL.TEXT_MODEL.INTERMEDIATE", 32, "MODEL.TEXT_MODEL.MAX_POS", 32,
    "TPU.FRAME_BUCKETS", "[4]", "TPU.COMPUTE_DTYPE", "float32",
    "TPU.REMAT_BACKBONE", "false", "DATALOADER.NUM_WORKERS", 1,
    "SOLVER.MAX_EPOCH", 4, "SOLVER.CHECKPOINT_PERIOD", 2,
    "SOLVER.TO_VAL", "true", "SOLVER.VAL_PERIOD", 2, "SOLVER.PRE_VAL", "false",
])

# rank 0 builds the caches, everyone else waits (ref train_net.py:58-65)
if proc_id == 0:
    write_synthetic_cache(data_dir, "VidSTG", "train", n_items=8, n_frames=8)
    write_synthetic_cache(data_dir, "VidSTG", "test", n_items=4, n_frames=8)
    os.makedirs(out_dir, exist_ok=True)
synchronize()

builder = lambda c, split: make_synthetic_dataset(c, split)
state, iteration = train(cfg, dataset_builder=builder, max_iters=3)
assert iteration == 3, iteration

# replicated state must be IDENTICAL across hosts after 3 synced steps
leaf = np.asarray(state.params["input_proj"]["kernel"])
sums = all_gather_objects(float(np.sum(leaf)))
assert len(sums) == 2 and abs(sums[0] - sums[1]) < 1e-6, sums

# collective orbax checkpoint: written once, readable on both ranks
ckdir = os.path.join(out_dir, "checkpoints")
assert os.path.exists(os.path.join(ckdir, "last_checkpoint"))

# metrics.jsonl written by rank 0 only
if is_main_process():
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))

# crash-resume: a fresh train() must pick up at iteration 3 and finish 4
synchronize()
state2, iteration2 = train(cfg, dataset_builder=builder, max_iters=4)
assert iteration2 == 4, iteration2
print(f"TRAIN_WORKER_{proc_id}_OK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["STCAT_REPO"] = REPO
    env.pop("TPU_NAME", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER_{i}_OK" in out


@pytest.mark.slow
def test_two_process_end_to_end_train(tmp_path):
    """train() itself under process_count()==2: multi-host batch assembly,
    psum'd steps keeping params bit-identical across ranks, collective orbax
    save, in-loop validation with gathered predictions, and crash-resume.
    Ref capability: scripts/train_net.py:282-296 8-proc launch."""
    worker = tmp_path / "train_worker.py"
    worker.write_text(TRAIN_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["STCAT_REPO"] = REPO
    env.pop("TPU_NAME", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    try:
        # generous: two full train() compiles run serially on a 1-core CI host
        outs = [p.communicate(timeout=1800)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"train worker {i} failed:\n{out[-4000:]}"
        assert f"TRAIN_WORKER_{i}_OK" in out
