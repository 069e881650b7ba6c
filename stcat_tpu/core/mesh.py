"""Device mesh + sharding setup for data/tensor-parallel training over ICI.

The reference's NCCL process-group / DDP wiring (scripts/train_net.py:282-284,
utils/comm.py) maps to a 1-D jax mesh with a 'data' axis: one clip per chip,
gradient pmean compiled onto ICI collectives, eval gather done host-side.

Beyond the reference's single strategy (DDP), the mesh can carry a second
'model' axis (cfg.TPU.MODEL_PARALLEL > 1): attention-head and FFN hidden
axes are sharded Megatron-style over it (`param_specs`), and GSPMD inserts
the activation all-reduces on ICI. Combined with SEQUENCE_PARALLEL (frame
axis over the mesh) this gives dp x tp x sp without any manual collectives.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"

# fields carrying a [B, T, ...] frame axis (VideoBatch / RawVideoBatch /
# VideoTargets)
_FRAME_AXIS_FIELDS = frozenset(
    {"frames", "frames_u8", "frames_y", "frames_cbcr", "frame_valid",
     "pixel_valid", "boxes", "box_valid", "actioness"}
)


def make_mesh(
    num_devices: int = 0,
    devices: Optional[list] = None,
    model_parallel: int = 1,
    seq_parallel: int = 1,
) -> Mesh:
    """Data-parallel mesh, optionally 2-D (data, model) / (data, seq) or 3-D
    (data, seq, model). num_devices 0 = all local devices. The innermost
    (fastest-varying) axis is 'model' so each model group sits on adjacent
    (ICI-neighbour) chips -- its activation all-reduces are the hottest
    collective; 'seq' sits next (frame-axis halo/all-gathers), 'data' (cold
    gradient all-reduce once per step) spans the slowest hops."""
    devs = devices if devices is not None else jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    mp = max(1, model_parallel)
    sp = max(1, seq_parallel)
    if mp == 1 and sp == 1:
        return Mesh(np.asarray(devs), (DATA_AXIS,))
    n = len(devs)
    if n % (mp * sp):
        raise ValueError(
            f"{n} devices not divisible by model_parallel={mp} x seq_parallel={sp}"
        )
    if sp == 1:
        grid = np.asarray(devs).reshape(n // mp, mp)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    if mp == 1:
        grid = np.asarray(devs).reshape(n // sp, sp)
        return Mesh(grid, (DATA_AXIS, SEQ_AXIS))
    grid = np.asarray(devs).reshape(n // (sp * mp), sp, mp)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def mesh_from_config(cfg) -> Mesh:
    """Build the mesh from cfg.TPU: MESH_DATA is the DATA-axis size (0 = use
    every available device), so with MODEL_PARALLEL=m and MESH_SEQ=s the mesh
    spans MESH_DATA*s*m devices -- MESH_DATA=8, MODEL_PARALLEL=2 gives an
    (8, 2) grid, never a silent (4, 2) downgrade of the global batch."""
    data = cfg.TPU.MESH_DATA
    mp = cfg.TPU.MODEL_PARALLEL
    sp = max(1, getattr(cfg.TPU, "MESH_SEQ", 1))
    return make_mesh(
        data * sp * mp if data else 0, model_parallel=mp, seq_parallel=sp
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_specs(batch: Any, sequence_parallel: bool, mesh: Mesh = None) -> Any:
    """PartitionSpec pytree for a VideoBatch/VideoTargets-shaped tree.

    Data-parallel: every leaf shards its leading (clip) axis. Sequence
    parallel (SURVEY §5 long-context plan): leaves with a frame axis
    ([B, T, ...]) shard axis 1 over the mesh -- the per-frame
    spatial/backbone work is embarrassingly parallel over T, and GSPMD
    inserts the all-gathers for the temporal (cross-frame) attention and
    criterion reductions. On a 1-D mesh the frame axis takes over the
    'data' axis (one long clip spans the mesh, per-clip leaves replicate);
    on a mesh with a dedicated 'seq' axis, clips shard over 'data' AND each
    clip's frames shard over 'seq' (combined dp x sp). Leaf classification
    is structural: axis 1 of a frame-carrying leaf has the common T extent.
    """
    if not sequence_parallel:
        return jax.tree_util.tree_map(lambda _: P(DATA_AXIS), batch)
    has_seq = mesh is not None and SEQ_AXIS in mesh.axis_names
    frame_spec = P(DATA_AXIS, SEQ_AXIS) if has_seq else P(None, DATA_AXIS)
    clip_spec = P(DATA_AXIS) if has_seq else P()

    def spec_of(path, _):
        name = None
        for p in reversed(path):
            name = getattr(p, "name", getattr(p, "key", None))
            if name is not None:
                break
        if name in _FRAME_AXIS_FIELDS:
            return frame_spec
        return clip_spec

    return jax.tree_util.tree_map_with_path(spec_of, batch)


def batch_shardings(batch: Any, mesh: Mesh, sequence_parallel: bool) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        batch_specs(batch, sequence_parallel, mesh),
    )


def video_batch_shardings(mesh: Mesh, sequence_parallel: bool):
    """(VideoBatch, VideoTargets) sharding trees without needing an instance
    (for jit in_shardings). Same field policy as batch_specs."""
    from .batch import VideoBatch, VideoTargets

    dp = NamedSharding(mesh, P(DATA_AXIS))
    if not sequence_parallel:
        return (
            VideoBatch(frames=dp, frame_valid=dp, pixel_valid=dp,
                       token_ids=dp, token_valid=dp),
            VideoTargets(boxes=dp, box_valid=dp, actioness=dp, temp_bound=dp),
        )
    has_seq = SEQ_AXIS in mesh.axis_names
    seq = NamedSharding(
        mesh, P(DATA_AXIS, SEQ_AXIS) if has_seq else P(None, DATA_AXIS)
    )
    rep = NamedSharding(mesh, P(DATA_AXIS) if has_seq else P())
    return (
        VideoBatch(frames=seq, frame_valid=seq, pixel_valid=seq,
                   token_ids=rep, token_valid=rep),
        VideoTargets(boxes=seq, box_valid=seq, actioness=seq, temp_bound=rep),
    )


def raw_batch_shardings(mesh: Mesh, sequence_parallel: bool, out_canvas,
                        yuv: bool = False):
    """(RawVideoBatch, VideoTargets) sharding trees for jit in_shardings.
    out_canvas must equal the incoming batch's static field (it is part of
    the pytree structure jit matches against), and yuv must match whether
    the batch carries 4:2:0 planes instead of frames_u8 (None leaves drop
    out of the pytree, so the spec tree's structure must agree)."""
    from .batch import RawVideoBatch, VideoTargets

    dp = NamedSharding(mesh, P(DATA_AXIS))
    if not sequence_parallel:
        pix = dict(frames_u8=None, frames_y=dp, frames_cbcr=dp) if yuv \
            else dict(frames_u8=dp)
        return (
            RawVideoBatch(
                frame_valid=dp, flip=dp, affine_scale=dp,
                affine_off=dp, out_size=dp, token_ids=dp, token_valid=dp,
                out_canvas=out_canvas, **pix,
            ),
            VideoTargets(boxes=dp, box_valid=dp, actioness=dp, temp_bound=dp),
        )
    has_seq = SEQ_AXIS in mesh.axis_names
    seq = NamedSharding(
        mesh, P(DATA_AXIS, SEQ_AXIS) if has_seq else P(None, DATA_AXIS)
    )
    rep = NamedSharding(mesh, P(DATA_AXIS) if has_seq else P())
    pix = dict(frames_u8=None, frames_y=seq, frames_cbcr=seq) if yuv \
        else dict(frames_u8=seq)
    return (
        RawVideoBatch(
            frame_valid=seq, flip=rep, affine_scale=rep,
            affine_off=rep, out_size=rep, token_ids=rep, token_valid=rep,
            out_canvas=out_canvas, **pix,
        ),
        VideoTargets(boxes=seq, box_valid=seq, actioness=seq, temp_bound=rep),
    )


def shard_batch(batch: Any, mesh: Mesh, sequence_parallel: bool = False) -> Any:
    """Place a host batch onto the data axis.

    Single-process: the batch's leading axis is GLOBAL (B = mesh size *
    per-chip batch) and device_put scatters it. Multi-process: each host
    holds only ITS shard (the loader already slices indices per host,
    data/loader.py make_loader), and the host-local arrays are assembled
    into one global jax.Array across processes -- the equivalent of the
    reference's per-rank DistributedSampler batches feeding DDP
    (datasets/build.py:85-92).
    """
    if sequence_parallel:
        # long-clip mode (single-process): frame axis over the mesh
        shs = batch_shardings(batch, mesh, True)
        return jax.tree_util.tree_map(jax.device_put, batch, shs)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        spec = P(DATA_AXIS)
        return jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, spec
            ),
            batch,
        )
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


# ---------------------------------------------------------------------------
# Tensor (model) parallelism: Megatron-style partition rules by param path.
#
# Column-parallel (shard the output/head axis; the per-shard result is a
# contiguous block of heads or FFN hidden units): every attention input
# projection -- flax MHA q/k/v and the decoder's sa_*/ca_* pre-projections
# that feed the head-split concat attention (models/attention.py) -- and the
# first FFN matmul (linear1 / roberta intermediate). Bias rides the shard.
#
# Row-parallel (shard the input/contraction axis; GSPMD inserts the
# all-reduce of the partial sums over 'model'): attention out_proj and the
# second FFN matmul (linear2 / roberta output). Bias replicated.
#
# Everything else (backbone convs, norms, embeddings, heads) is replicated:
# the conv backbone parallelizes over the frame axis (SEQUENCE_PARALLEL),
# not channels, and the prediction heads are too small to matter.
# ---------------------------------------------------------------------------

_TP_COL = re.compile(
    r"(?:^|/)(?:q_proj|k_proj|v_proj|sa_\w*_proj|ca_\w*_proj|linear1|intermediate)"
    r"/(kernel|bias)$"
)
_TP_ROW = re.compile(r"(?:^|/)(?:out_proj|linear2|output)/(kernel|bias)$")


def _path_str(path) -> str:
    parts = []
    for p in path:
        name = getattr(p, "name", None)
        if name is None:
            name = getattr(p, "key", None)
        if name is None:
            name = getattr(p, "idx", None)
        parts.append(str(name) if name is not None else str(p))
    return "/".join(parts)


def tp_spec(pathstr: str, leaf: Any) -> P:
    """PartitionSpec over the 'model' axis for one param-tree leaf."""
    ndim = getattr(leaf, "ndim", None)
    m = _TP_COL.search(pathstr)
    if m:
        if m.group(1) == "kernel" and ndim == 2:
            return P(None, MODEL_AXIS)
        if m.group(1) == "bias" and ndim == 1:
            return P(MODEL_AXIS)
        return P()
    m = _TP_ROW.search(pathstr)
    if m and m.group(1) == "kernel" and ndim == 2:
        return P(MODEL_AXIS, None)
    return P()


def state_shardings(tree: Any, mesh: Mesh, min_model_sharded: int = 0) -> Any:
    """NamedSharding pytree for any param-bearing tree (params, TrainState,
    optax state). With a 'model' mesh axis the Megatron rules above apply;
    otherwise everything replicates. Optimizer-state leaves (mu/nu/EMA)
    inherit their param's spec because their tree paths END with the param's
    path, which is all the rules match on.

    min_model_sharded guards the name-suffix rules: a module rename would
    silently degrade every leaf to replication (GSPMD keeps the math right,
    only perf/memory regress) -- callers that know the tree holds transformer
    params pass >0 and get a loud error instead."""
    if MODEL_AXIS not in mesh.axis_names:
        rep = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: rep, tree)

    n_sharded = 0

    def f(path, leaf):
        nonlocal n_sharded
        spec = tp_spec(_path_str(path), leaf)
        if MODEL_AXIS in spec:
            n_sharded += 1
        return NamedSharding(mesh, spec)

    out = jax.tree_util.tree_map_with_path(f, tree)
    if n_sharded < min_model_sharded:
        raise ValueError(
            f"tensor-parallel partition rules matched only {n_sharded} leaves "
            f"(expected >= {min_model_sharded}); the _TP_COL/_TP_ROW name "
            "patterns in core/mesh.py no longer match the model's module names"
        )
    return out


def shard_state(tree: Any, mesh: Mesh) -> Any:
    """Place a param-bearing tree onto the mesh per `state_shardings`.

    Multi-process: leaves that are process-LOCAL jax.Arrays (fresh init or a
    checkpoint restore -- every process holds an identical copy) go through
    host numpy first. device_put treats numpy as same-on-every-process and
    builds the global array from local copies, whereas a committed jax.Array
    source demands a cross-host device transfer most backends refuse."""

    def put(x, s):
        if (
            jax.process_count() > 1
            and isinstance(x, jax.Array)
            and getattr(x, "is_fully_addressable", True)
        ):
            x = np.asarray(x)
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, tree, state_shardings(tree, mesh))
