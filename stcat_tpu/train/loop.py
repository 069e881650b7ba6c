"""Training loop: data loading, jitted step, meters, eval, checkpointing.

Reference: scripts/train_net.py:21-202 (the hot loop :97-190). Differences are
the TPU execution model: the step is one jitted program; metrics are fetched
sparsely (every log period) so the device never stalls on the host.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..core.logging import MetricLogger, setup_logger
from ..core.mesh import mesh_from_config, shard_batch
from ..data.loader import make_loader
from ..models import STCATNet
from .checkpoint import Checkpointer
from .optimizer import current_lrs, make_optimizer
from .step import (
    create_train_state,
    init_variables,
    make_eval_forward,
    make_train_step,
)


def load_pretrained_weight(cfg: Config, state, logger):
    """Initialize from a torch .pth (reference STCAT or MDETR) checkpoint.

    ref utils/checkpoint.py:68-87 + 122-206: MDETR checkpoints partially
    initialize (backbone/text/spatial-encoder/decoder); reference checkpoints
    load fully; EMA starts as a copy of the loaded weights.
    """
    path = cfg.MODEL.WEIGHT
    if not path.endswith((".pth", ".pt", ".bin")):
        logger.info(f"MODEL.WEIGHT {path} is not a torch checkpoint; skipping"
                    " (orbax checkpoints are handled by the resume path)")
        return state
    if not os.path.exists(path):
        logger.warning(f"MODEL.WEIGHT {path} not found; training from scratch")
        return state

    from .checkpoint import load_torch_file
    from .convert_reference import (
        convert_reference_stcat,
        merge_partial,
        remap_mdetr,
    )

    sd = load_torch_file(path)
    if any(k.startswith("transformer.") for k in sd):
        logger.info("detected MDETR-style checkpoint; partial init")
        sd = remap_mdetr(sd)
        partial, constants, _ = convert_reference_stcat(sd, cfg, strict=False)
        params = merge_partial(state.params, partial)
        constants = merge_partial(state.constants, constants)
    else:
        params, constants, unused = convert_reference_stcat(sd, cfg)
        if unused:
            logger.warning(f"{len(unused)} reference keys unconverted: "
                           f"{sorted(unused)[:5]} ...")
    ema = (
        jax.tree_util.tree_map(jnp.array, params)
        if state.ema_params is not None
        else None
    )
    return state.replace(params=params, constants=constants, ema_params=ema)


def train(cfg: Config, dataset_builder=None, logger=None, max_iters: Optional[int] = None):
    """Full training entry. dataset_builder(cfg, split) -> dataset (defaults
    to the real benchmarks; tests/benches inject the synthetic one)."""
    from ..data.datasets import build_dataset
    from ..eval import build_evaluator, do_eval

    logger = logger or setup_logger("stcat_tpu", cfg.OUTPUT_DIR)
    dataset_builder = dataset_builder or (lambda c, split: build_dataset(c, split))
    mesh = mesh_from_config(cfg)
    logger.info(f"mesh: {mesh.size} device(s), shape {dict(mesh.shape)}")

    train_ds = dataset_builder(cfg, "train")
    loader = make_loader(cfg, train_ds, mesh, "train")
    num_training_steps = cfg.SOLVER.MAX_EPOCH * loader.iters_per_epoch
    if max_iters is not None:
        num_training_steps = min(num_training_steps, max_iters)

    model = STCATNet(cfg)
    sample = next(iter(make_loader(cfg, train_ds, mesh, "val")))
    variables = init_variables(
        cfg, model, jax.random.PRNGKey(cfg.SEED),
        jax.tree_util.tree_map(lambda x: x[:1], sample[0]),
    )
    tx, _ = make_optimizer(cfg, variables["params"], num_training_steps)
    state = create_train_state(cfg, variables, tx)
    step_fn = make_train_step(cfg, model, tx, mesh, example_state=state)
    lrs_at = current_lrs(cfg, num_training_steps)

    ckpt = Checkpointer(cfg.OUTPUT_DIR or ".", logger) if cfg.OUTPUT_DIR else None
    start_iter = 0
    if ckpt is not None and ckpt.has_checkpoint():
        # crash-resume overrides MODEL.WEIGHT (ref checkpoint.py:68-75)
        state, start_iter = ckpt.restore(state)
        logger.info(f"Resumed from iteration {start_iter}")
        loader.start_iter = start_iter
    elif cfg.MODEL.WEIGHT:
        state = load_pretrained_weight(cfg, state, logger)
    # place over the mesh (restored arrays come back committed to dev 0):
    # replicated on a 1-D mesh, Megatron-TP-sharded on a (data, model) mesh
    from ..core.mesh import shard_state

    state = shard_state(state, mesh)

    if cfg.SOLVER.PRE_VAL:
        run_validation(cfg, model, state, mesh, dataset_builder, logger)

    from ..core.dist import is_main_process
    from ..core.metrics_writer import MetricsWriter

    # rank-0 only (ref train_net.py:79-82): on multi-host runs every process
    # executes this loop and OUTPUT_DIR is usually shared storage
    writer = (
        MetricsWriter(cfg.OUTPUT_DIR, cfg.TENSORBOARD_DIR or None)
        if cfg.OUTPUT_DIR and is_main_process()
        else None
    )

    # preemption tolerance: a SIGTERM requests a checkpoint at the next
    # iteration boundary (TPU pods get preempted; the reference only had
    # crash-resume via last_checkpoint)
    stop_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        stop_requested["flag"] = True

    prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)

    meters = MetricLogger()
    rng = jax.random.PRNGKey(cfg.SEED + 1)
    t_last = time.time()
    iteration = start_iter

    # host->device transfer pipelining: batch i+1 is device_put by a
    # background thread while step i executes (core/prefetch.py). Multi-host
    # placement is collective (host_local_array_to_global_array) and must
    # stay on the main thread in lockstep with the other collectives.
    sp = cfg.TPU.SEQUENCE_PARALLEL

    def _place(item):
        b, t, m = item
        return (
            shard_batch(b, mesh, sequence_parallel=sp),
            shard_batch(t, mesh, sequence_parallel=sp),
            m,
        )

    if jax.process_count() == 1:
        from ..core.prefetch import device_prefetch

        stream = device_prefetch(iter(loader), _place, depth=2)
    else:
        stream = (_place(x) for x in loader)

    for batch, targets, _meta in stream:
        if iteration >= num_training_steps:
            break
        data_time = time.time() - t_last
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, batch, targets, step_rng)
        iteration += 1
        step_time = time.time() - t_last
        t_last = time.time()

        if cfg.TPU.PROFILE_STEP >= 0 and iteration == cfg.TPU.PROFILE_STEP:
            try:
                jax.profiler.start_trace(os.path.join(cfg.OUTPUT_DIR or ".", "trace"))
            except Exception as e:  # tunneled/experimental backends may lack it
                logger.warning(f"profiler unavailable: {e}")
        if cfg.TPU.PROFILE_STEP >= 0 and iteration == cfg.TPU.PROFILE_STEP + 3:
            try:
                jax.profiler.stop_trace()
                logger.info("profiler trace captured")
            except Exception:
                pass

        if iteration % 50 == 0 or iteration == num_training_steps:
            host = {k: float(v) for k, v in jax.device_get(metrics).items()
                    if not k.startswith("loss_") or "_0" not in k}
            meters.update(time=step_time, data=data_time, **host)
            lrs = lrs_at(iteration)
            logger.info(
                f"iter {iteration}/{num_training_steps}  {meters}  "
                + "  ".join(f"lr_{k}: {v:.2e}" for k, v in lrs.items())
            )
            if writer is not None:
                # HBM occupancy in the metrics stream: long runs must show
                # no memory drift (leaked buffers from the async-checkpoint /
                # prefetch threads would show up here long before an OOM)
                mem = {}
                try:
                    s = jax.local_devices()[0].memory_stats() or {}
                    if "bytes_in_use" in s:
                        mem["hbm_in_use_gb"] = s["bytes_in_use"] / 2**30
                    if "peak_bytes_in_use" in s:
                        mem["hbm_peak_gb"] = s["peak_bytes_in_use"] / 2**30
                except Exception:
                    pass  # not every backend exposes memory_stats
                writer.write(
                    iteration,
                    {**host, **{f"lr_{k}": v for k, v in lrs.items()},
                     "step_time": step_time, "data_time": data_time, **mem},
                )

        if ckpt is not None and (
            iteration % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or stop_requested["flag"]
        ):
            # preemption save must COMMIT before the process dies; periodic
            # saves serialize on a background thread while training continues
            ckpt.save(iteration, state, block=stop_requested["flag"])
        if stop_requested["flag"]:
            logger.info("SIGTERM received; checkpointed and stopping")
            break

        if (
            cfg.SOLVER.TO_VAL
            and iteration % cfg.SOLVER.VAL_PERIOD == 0
            and iteration != num_training_steps
        ):
            run_validation(cfg, model, state, mesh, dataset_builder, logger)

    if ckpt is not None:
        ckpt.save(iteration, state, block=True)
    if writer is not None:
        writer.close()
    signal.signal(signal.SIGTERM, prev_handler)
    return state, iteration


def run_validation(cfg, model, state, mesh, dataset_builder, logger):
    """In-training eval with the EMA weights (ref train_net.py:205-223)."""
    from ..eval import build_evaluator, do_eval

    try:
        val_ds = dataset_builder(cfg, "test")
    except FileNotFoundError:
        logger.info("no test split available; skipping validation")
        return None
    loader = make_loader(cfg, val_ds, mesh, "test")
    evaluator = build_evaluator(cfg, logger, "test")
    params = state.ema_params if state.ema_params is not None else state.params
    fwd = make_eval_forward(cfg, model, mesh, example_params=params)
    res = do_eval(cfg, model, params, state.constants, loader, evaluator, fwd,
                  logger, mesh=mesh)
    return res
