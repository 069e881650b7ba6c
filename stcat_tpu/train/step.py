"""Jitted, shard_mapped train/eval steps: the DDP translation.

Reference hot loop (scripts/train_net.py:97-190): forward, loss, backward with
DDP gradient all-reduce, clip 0.1, step, LR adjust, EMA. Here the whole
iteration is ONE jitted program over the data mesh:

  - each device computes its own clip's loss (same per-rank denominators as
    the reference -- see criterion.py docstring);
  - num_boxes is psum'd across the mesh (ref criterion.py:173-178);
  - per-device grads are pmean'd (DDP all-reduce, ref train_net.py:31-36);
  - optimizer + EMA update run replicated inside the same program.

No host round-trips inside an iteration; the loss dict comes back already
cross-replica averaged (ref utils/comm.py:130-152 reduce_loss_dict).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import Config
from ..core.batch import VideoBatch, VideoTargets
from ..core.mesh import DATA_AXIS
from .criterion import build_weight_dict, video_stg_loss
from .optimizer import ema_update


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
    cfg: Config, model, tx, mesh: Mesh
) -> Callable[[TrainState, VideoBatch, VideoTargets, jax.Array], Tuple[TrainState, Dict]]:
    """Returns jitted step(state, batch, targets, rng) -> (state, metrics)."""
    weight_dict = build_weight_dict(cfg)
    s = cfg.SOLVER
    ndev = mesh.size
    ema_decay = cfg.MODEL.EMA_DECAY
    use_ema = cfg.MODEL.EMA

    def local_loss(params, constants, batch, targets, rng):
        outputs = model.apply(
            {"params": params, "constants": constants},
            batch,
            deterministic=False,
            rngs={"dropout": rng},
        )
        local_boxes = targets.box_valid.sum().astype(jnp.float32)
        num_boxes = jnp.maximum(
            jax.lax.psum(local_boxes, DATA_AXIS) / ndev, 1.0
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
        total = sum(
            losses[k] * w for k, w in weight_dict.items() if k in losses
        )
        return total, losses

    def step_fn(state: TrainState, batch, targets, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        (total, losses), grads = jax.value_and_grad(local_loss, has_aux=True)(
            state.params, state.constants, batch, targets, rng
        )
        grads = jax.lax.pmean(grads, DATA_AXIS)
        total = jax.lax.pmean(total, DATA_AXIS)
        losses = jax.lax.pmean(losses, DATA_AXIS)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        ema_params = (
            ema_update(state.ema_params, params, ema_decay) if use_ema else None
        )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        metrics = {"loss": total, **losses}
        return new_state, metrics

    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_forward(cfg: Config, model, mesh: Mesh):
    """Jitted data-parallel inference forward returning postprocess inputs."""

    def fwd(params, constants, batch):
        out = model.apply(
            {"params": params, "constants": constants}, batch, deterministic=True
        )
        return {
            "pred_boxes": out["pred_boxes"],
            "pred_sted": out["pred_sted"],
        }

    sharded = shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )
    return jax.jit(sharded)
