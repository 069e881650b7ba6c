"""Jitted data-parallel train/eval steps (GSPMD sharding, no manual collectives).

Reference hot loop (scripts/train_net.py:97-190): forward, loss, backward with
DDP gradient all-reduce, clip 0.1, step, LR adjust, EMA. Here the whole
iteration is ONE jitted program compiled against sharding annotations:

  - the batch is sharded over the 'data' mesh axis (one clip per chip), the
    state is replicated; XLA inserts the gradient all-reduce over ICI when it
    differentiates the batch-mean loss (exactly DDP's pmean);
  - the criterion is written in global-batch form with per-clip denominators
    (train/criterion.py docstring) so no explicit psum of num_boxes is needed
    (ref criterion.py:173-178 becomes a plain global reduction);
  - optimizer + EMA run replicated inside the same program with the state
    donated -- jit aliases the 3 GB optimizer/EMA buffers in place.

Why jit + shardings instead of shard_map: shard_map blocks input/output
buffer aliasing through its boundary, so the donated train state was copied
every step; with the full Adam+EMA state that pushed HBM to the edge and the
runtime into ~100x-slower thrashing (measured 26 s/step vs 0.26 s/step for
the identical math under plain jit).

No host round-trips inside an iteration; the loss dict comes back already
globally reduced (ref utils/comm.py:130-152 reduce_loss_dict equivalent).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..core.batch import RawVideoBatch, VideoBatch, VideoTargets
from ..core.mesh import DATA_AXIS
from ..ops.preprocess import preprocess
from .criterion import build_weight_dict, video_stg_loss
from .optimizer import ema_update


def _as_video_batch(cfg: Config, batch):
    """Trace-time dispatch: RawVideoBatch -> on-device flip/resample/normalize
    (ops/preprocess.py); VideoBatch passes through."""
    if isinstance(batch, RawVideoBatch):
        return preprocess(
            batch, tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)
        )
    return batch


def init_variables(cfg: Config, model, rng, batch):
    """model.init through the same preprocess path the steps use (raw
    batches cannot feed STCATNet directly)."""

    def init_fn(rng, b):
        return model.init(rng, _as_video_batch(cfg, b))

    return jax.jit(init_fn)(rng, batch)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    constants: Any          # frozen-BN folded stats etc. (never updated)
    opt_state: Any
    ema_params: Any


def create_train_state(cfg: Config, variables: Dict, tx) -> TrainState:
    params = variables["params"]
    constants = variables.get("constants", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        constants=constants,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if cfg.MODEL.EMA else None,
    )


def make_train_step(
    cfg: Config, model, tx, mesh: Mesh, example_state: TrainState = None
) -> Callable[[TrainState, VideoBatch, VideoTargets, jax.Array], Tuple[TrainState, Dict]]:
    """Returns jitted step(state, batch, targets, rng) -> (state, metrics).

    On a 1-D mesh the state is replicated (the reference's DDP model).
    On a 2-D (data, model) mesh (cfg.TPU.MODEL_PARALLEL > 1) the state is
    sharded per core.mesh.state_shardings (Megatron TP) -- `example_state`
    (a concrete or eval_shape'd TrainState) is required to derive the
    per-leaf specs, and the caller must place the state with
    core.mesh.shard_state before the first call."""
    weight_dict = build_weight_dict(cfg)
    s = cfg.SOLVER
    ema_decay = cfg.MODEL.EMA_DECAY
    use_ema = cfg.MODEL.EMA

    accum = int(cfg.TPU.GRAD_ACCUM)
    if accum < 1:
        raise ValueError(f"TPU.GRAD_ACCUM must be >= 1, got {accum}")

    def global_loss(params, constants, batch, targets, rng, num_boxes):
        batch = _as_video_batch(cfg, batch)
        outputs = model.apply(
            {"params": params, "constants": constants},
            batch,
            deterministic=False,
            rngs={"dropout": rng},
        )
        losses = video_stg_loss(
            outputs,
            targets,
            batch.frame_valid,
            num_boxes,
            sigma=s.SIGMA,
            eos_coef=s.EOS_COEF,
            use_attn=s.USE_ATTN,
            use_actioness=cfg.MODEL.STCAT.USE_ACTION,
        )
        total = sum(losses[k] * w for k, w in weight_dict.items() if k in losses)
        return total, losses

    data_size = mesh.shape.get(DATA_AXIS, 1)

    def _split_microbatches(tree):
        """[B, ...] leaves -> [A, B//A, ...]. When the per-microbatch rows
        divide the data-axis size, interleave so each microbatch keeps one
        contiguous row block per device shard (a local reshape under GSPMD,
        no resharding collective); otherwise a plain reshape (correct --
        every loss term is linear in per-clip contributions, so microbatch
        composition cannot change the averaged loss/grads -- just slower)."""

        def split(leaf):
            b = leaf.shape[0]
            mb = b // accum
            if data_size > 1 and mb % data_size == 0:
                x = leaf.reshape((data_size, accum, mb // data_size) + leaf.shape[1:])
                x = jnp.swapaxes(x, 0, 1)
                return x.reshape((accum, mb) + leaf.shape[1:])
            return leaf.reshape((accum, mb) + leaf.shape[1:])

        return jax.tree_util.tree_map(split, tree)

    def step_fn(state: TrainState, batch, targets, rng):
        b = targets.box_valid.shape[0]
        # clamp(global boxes / B, 1): the reference's cross-rank normalizer
        # (criterion.py:173-178), computed on the FULL batch so accumulated
        # microbatch losses share the global denominator
        num_boxes = jnp.maximum(
            targets.box_valid.sum().astype(jnp.float32) / b, 1.0
        )
        if accum == 1:
            (total, losses), grads = jax.value_and_grad(
                global_loss, has_aux=True
            )(state.params, state.constants, batch, targets, rng, num_boxes)
        else:
            if b % accum:
                raise ValueError(
                    f"TPU.GRAD_ACCUM={accum} does not divide batch size {b}"
                )
            mb_batch = _split_microbatches(batch)
            mb_targets = _split_microbatches(targets)

            def micro(i, one_batch, one_targets):
                return jax.value_and_grad(global_loss, has_aux=True)(
                    state.params, state.constants, one_batch, one_targets,
                    jax.random.fold_in(rng, i), num_boxes,
                )

            first = jax.tree_util.tree_map(lambda x: x[0], (mb_batch, mb_targets))
            shapes = jax.eval_shape(micro, jnp.zeros((), jnp.int32), *first)
            init = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            )

            def body(acc, xs):
                one_batch, one_targets, i = xs
                out = micro(i, one_batch, one_targets)
                return jax.tree_util.tree_map(jnp.add, acc, out), None

            acc, _ = jax.lax.scan(
                body, init, (mb_batch, mb_targets, jnp.arange(accum))
            )
            (total, losses), grads = jax.tree_util.tree_map(
                lambda x: x / accum, acc
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        ema_params = (
            ema_update(state.ema_params, params, ema_decay) if use_ema else None
        )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        return new_state, {"loss": total, **losses}

    from ..core.mesh import (
        MODEL_AXIS, raw_batch_shardings, state_shardings, video_batch_shardings,
    )

    rep = NamedSharding(mesh, P())
    if MODEL_AXIS in mesh.axis_names:
        if example_state is None:
            raise ValueError(
                "a 2-D (data, model) mesh needs example_state to derive the "
                "tensor-parallel state shardings"
            )
        _validate_tp(cfg, mesh)
        state_sh = state_shardings(
            example_state, mesh, min_model_sharded=_min_tp_leaves(cfg)
        )
    else:
        state_sh = jax.tree_util.tree_map(lambda _: rep, example_state) \
            if example_state is not None else rep

    # One jitted program per batch KIND: a RawVideoBatch's static out_canvas
    # is part of its pytree structure, so the in_shardings tree must be
    # rebuilt to match (jit itself still caches per shape as usual).
    jitted = {}

    def step(state, batch, targets, rng):
        canvas = getattr(batch, "out_canvas", None)
        yuv = getattr(batch, "frames_y", None) is not None
        key = None if canvas is None else (canvas, yuv)
        fn = jitted.get(key)
        if fn is None:
            if key is None:
                batch_sh, targets_sh = video_batch_shardings(
                    mesh, cfg.TPU.SEQUENCE_PARALLEL
                )
            else:
                batch_sh, targets_sh = raw_batch_shardings(
                    mesh, cfg.TPU.SEQUENCE_PARALLEL, canvas, yuv=yuv
                )
            fn = jax.jit(
                step_fn,
                in_shardings=(state_sh, batch_sh, targets_sh, rep),
                out_shardings=(state_sh, rep),
                donate_argnums=(0,),
            )
            jitted[key] = fn
        return fn(state, batch, targets, rng)

    # expose the per-batch-kind jit wrappers: probes use them for AOT
    # lower().compile().memory_analysis() (the axon runtime returns no
    # device memory_stats, so compile-side analysis is the HBM evidence)
    step.jitted = jitted
    return step


def _min_tp_leaves(cfg: Config) -> int:
    """Loose lower bound on model-axis-sharded leaves: every encoder/decoder
    transformer layer carries at least one column- and one row-parallel
    kernel, so a partition-rule/module-name drift that drops a whole stack
    to replication trips the state_shardings guard."""
    s = cfg.MODEL.STCAT
    return 2 * (s.ENC_LAYERS + 2 * s.DEC_LAYERS)


def _validate_tp(cfg: Config, mesh: Mesh) -> None:
    from ..core.mesh import MODEL_AXIS

    mp = mesh.shape[MODEL_AXIS]
    st, tm = cfg.MODEL.STCAT, cfg.MODEL.TEXT_MODEL
    for name, val in (
        ("STCAT.HEADS", st.HEADS),
        ("STCAT.FFN_DIM", st.FFN_DIM),
        ("TEXT_MODEL.HEADS", tm.HEADS),
        ("TEXT_MODEL.INTERMEDIATE", tm.INTERMEDIATE),
    ):
        if val % mp:
            raise ValueError(
                f"MODEL.{name}={val} not divisible by model-parallel size {mp}"
            )


def eval_device_split_active(cfg: Config) -> bool:
    """Whether the eval forward splits the two test streams ON DEVICE
    (TPU.EVAL_DEVICE_SPLIT). Single-process only: the multi-host eval path
    assembles host-stacked batches in collective lockstep (eval/engine.py),
    so the flag is ignored there. Callers that stack streams on the host
    themselves (serve.py) must build the forward with device_split=False."""
    import jax

    return bool(cfg.TPU.EVAL_DEVICE_SPLIT) and jax.process_count() == 1


def make_eval_forward(cfg: Config, model, mesh: Mesh, example_params=None,
                      device_split=None):
    """Jitted data-parallel inference forward returning postprocess inputs.

    `example_params` is only needed on a 2-D (data, model) mesh, to derive
    the tensor-parallel param shardings (see make_train_step).

    `device_split=None` resolves to eval_device_split_active(cfg) — the
    same gate do_eval uses, so the forward and the engine agree on whether
    batches arrive unsplit (split happens in-program) or host-stacked.
    Pass False explicitly when feeding host-stacked batches (serve.py)."""

    device_split = (
        eval_device_split_active(cfg) if device_split is None
        else bool(device_split)
    )

    def fwd(params, constants, batch):
        if device_split:
            from ..core.batch import device_split_streams

            batch = device_split_streams(batch)
        batch = _as_video_batch(cfg, batch)
        out = model.apply(
            {"params": params, "constants": constants}, batch, deterministic=True
        )
        ret = {
            "pred_boxes": out["pred_boxes"],
            "pred_sted": out["pred_sted"],
        }
        if device_split:
            # the caller never sees the split batch; return its frame mask
            # for postprocess/row decoding (eval/engine.do_eval)
            ret["frame_valid"] = batch.frame_valid
        return ret

    from ..core.mesh import (
        MODEL_AXIS, raw_batch_shardings, state_shardings, video_batch_shardings,
    )

    rep = NamedSharding(mesh, P())
    if MODEL_AXIS in mesh.axis_names:
        if example_params is None:
            raise ValueError(
                "a 2-D (data, model) mesh needs example_params to derive the "
                "tensor-parallel param shardings"
            )
        params_sh = state_shardings(
            example_params, mesh, min_model_sharded=_min_tp_leaves(cfg)
        )
    else:
        params_sh = rep
    from ..core.mesh import SEQ_AXIS

    if cfg.TPU.SEQUENCE_PARALLEL:
        # outputs are [B, T, ...]: keep the frame axis sharded (over 'seq'
        # when the mesh carries a dedicated axis, else over 'data')
        if SEQ_AXIS in mesh.axis_names:
            out_sh = NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))
        else:
            out_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    else:
        out_sh = NamedSharding(mesh, P(DATA_AXIS))

    jitted = {}

    def wrapped(params, constants, batch):
        canvas = getattr(batch, "out_canvas", None)
        yuv = getattr(batch, "frames_y", None) is not None
        key = None if canvas is None else (canvas, yuv)
        fn = jitted.get(key)
        if fn is None:
            if key is None:
                batch_sh, _ = video_batch_shardings(mesh, cfg.TPU.SEQUENCE_PARALLEL)
            else:
                batch_sh, _ = raw_batch_shardings(
                    mesh, cfg.TPU.SEQUENCE_PARALLEL, canvas, yuv=yuv
                )
            fn = jax.jit(
                fwd, in_shardings=(params_sh, rep, batch_sh), out_shardings=out_sh
            )
            jitted[key] = fn
        return fn(params, constants, batch)

    return wrapped
