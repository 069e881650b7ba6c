"""AOT shape precompilation into the persistent XLA cache.

XLA compiles one program per input-shape signature; with multi-scale
augmentation on (INPUT.AUG_SCALE / AUG_CROP, ref datasets/transforms.py
RandomResize/RandomSizeCrop) a training run meets a new (frame bucket x
source canvas x output canvas) signature mid-epoch and stalls for the
compile -- minutes per shape on remote-compile TPU platforms. This tool
enumerates every signature a recipe can produce WITHOUT decoding a single
pixel (Loader.scan_signatures replays the exact epoch/rng streams through
plan-only samples) and runs each through the real jitted train step / eval
forward once, populating the persistent compilation cache
(TPU.COMPILE_CACHE_DIR) so the production run never compiles.

The torch reference has no analogue: cuDNN handles dynamic shapes at
kernel-dispatch time. Under XLA, shape management is a first-class
production concern -- this is the corresponding tool.

    python -m stcat_tpu.cli.precompile --config-file experiments/VidSTG/e2e_STCAT_R101_VidSTG.yaml \
        DATA_DIR /data/vidstg OUTPUT_DIR out/            # cache lands in out/compile_cache
    python -m stcat_tpu.cli.precompile ... --list        # enumerate only
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description="STCAT-TPU AOT shape precompile")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--mode", choices=["train", "eval", "both"], default="both")
    p.add_argument(
        "--epochs", type=int, default=0,
        help="train epochs of augmentation draws to scan; 0 (default) = "
        "cfg.SOLVER.MAX_EPOCH, i.e. exactly the epochs the production run "
        "will draw -- the per-sample augmentation rng is keyed on the "
        "global iteration, so scanning fewer epochs than the run trains "
        "covers only a prefix of the rng stream and later iterations can "
        "still hit unscanned signatures (eval is deterministic, one pass)",
    )
    p.add_argument("--list", action="store_true",
                   help="print the signature inventory and exit (no compiles)")
    p.add_argument(
        "--max-iters", type=int, default=None,
        help="pass the SAME value as cli.train --max-iters (it clamps the "
        "LR-schedule horizon, which is baked into the compiled step)",
    )
    p.add_argument("--synthetic", action="store_true",
                   help="scan the synthetic dataset (tests/benches)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def scan(cfg, dataset_builder, mode: str, epochs: int, logger):
    """{split: {signature: exemplar samples}} for the requested modes."""
    from ..core.mesh import mesh_from_config
    from ..data.loader import make_loader

    mesh = mesh_from_config(cfg)
    out = {}
    splits = {"train": ["train"], "eval": ["test"], "both": ["train", "test"]}
    for split in splits[mode]:
        ds = dataset_builder(cfg, split)
        loader = make_loader(cfg, ds, mesh, split)
        t0 = time.perf_counter()
        sigs = loader.scan_signatures(epochs)
        logger.info(
            f"{split}: {len(sigs)} signature(s) over "
            f"{loader.iters_per_epoch * (epochs if split == 'train' else 1)} "
            f"planned batches ({time.perf_counter() - t0:.1f}s, no decode)"
        )
        for (b, t, src, outc, layout) in sorted(sigs):
            logger.info(
                f"  B={b} T={t} src={src[0]}x{src[1]} out={outc[0]}x{outc[1]} "
                f"{layout}"
            )
        out[split] = (loader, sigs)
    return mesh, out


def main():
    args = parse_args()
    if os.environ.get("JAX_COORDINATOR"):
        import jax

        jax.distributed.initialize()

    from ..config import default_config, merge_from_file, merge_from_list
    from ..core.logging import setup_logger
    from ..core.xla_cache import setup_compile_cache

    cfg = default_config()
    if args.config_file:
        cfg = merge_from_file(cfg, args.config_file)
    if args.opts:
        cfg = merge_from_list(cfg, args.opts)
    if not cfg.TPU.DEVICE_PREPROCESS:
        raise SystemExit(
            "precompile targets the raw (TPU.DEVICE_PREPROCESS) input path; "
            "legacy host-transform shapes key only on (bucket, resolution)"
        )
    setup_compile_cache(cfg)
    logger = setup_logger("precompile", cfg.OUTPUT_DIR)

    if args.synthetic:
        from ..data.synthetic import make_synthetic_dataset as dataset_builder
    else:
        from ..data.datasets import build_dataset

        dataset_builder = lambda c, split: build_dataset(c, split)

    epochs = args.epochs if args.epochs > 0 else cfg.SOLVER.MAX_EPOCH
    mesh, scanned = scan(cfg, dataset_builder, args.mode, epochs, logger)
    if args.list:
        return 0

    import jax
    import numpy as np

    from ..core.mesh import shard_batch, shard_state
    from ..models import STCATNet
    from ..train.optimizer import make_optimizer
    from ..train.step import (
        create_train_state, init_variables, make_eval_forward, make_train_step,
    )

    model = STCATNet(cfg)
    any_loader, any_sigs = next(iter(scanned.values()))
    first = next(iter(any_sigs.values()))
    init_b, _, _ = any_loader._make_batch(first[:1])
    variables = init_variables(
        cfg, model, jax.random.PRNGKey(cfg.SEED), init_b
    )
    # host snapshot: the train step donates its state, which would delete
    # the device buffers the eval section reads (donation aliasing)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    compiled = 0

    if "train" in scanned:
        loader, sigs = scanned["train"]
        # num_training_steps EXACTLY as train() derives it (train/loop.py:89):
        # the LR-schedule constants (warmup/decay horizons) are baked into the
        # jitted step's HLO, so a different horizon keys a DIFFERENT persistent
        # cache entry and the production run would recompile everything
        num_training_steps = cfg.SOLVER.MAX_EPOCH * loader.iters_per_epoch
        if args.max_iters is not None:
            num_training_steps = min(num_training_steps, args.max_iters)
        tx, _ = make_optimizer(
            cfg, variables["params"], num_training_steps=num_training_steps
        )
        state = create_train_state(cfg, variables, tx)
        step = make_train_step(cfg, model, tx, mesh, example_state=state)
        state = shard_state(state, mesh)
        rng = jax.random.PRNGKey(0)
        for sig, samples in sorted(sigs.items()):
            t0 = time.perf_counter()
            batch, targets, _ = loader._make_batch(samples)
            # one real dispatch per signature: populates both the in-process
            # jit cache layer the train loop uses and the persistent XLA
            # cache (zero pixels -- the values are irrelevant, the shapes
            # are the product)
            state, metrics = step(
                state, shard_batch(batch, mesh), shard_batch(targets, mesh), rng
            )
            float(metrics["loss"])
            compiled += 1
            logger.info(f"train {sig}: {time.perf_counter() - t0:.1f}s")

    if "test" in scanned:
        # what the device actually compiles at eval must mirror do_eval
        # (eval/engine.py): with TPU.EVAL_DEVICE_SPLIT active the program's
        # input is the UNSPLIT loader batch (the even/odd split happens
        # inside the jitted forward); otherwise it is the host-stacked
        # 2-stream form (B' = 2B, T' = t_bucket/2). Plus the postprocess
        # program per shape.
        from ..core.batch import stack_streams
        from ..eval.engine import _postprocess_jit, subsample_batch

        from ..core.mesh import replicate
        from ..train.step import eval_device_split_active

        loader, sigs = scanned["test"]
        # place over the mesh like run_validation does (train/loop.py:244):
        # a bare device_put of process-local arrays fails under the
        # multi-host path, and a TP mesh needs the Megatron param shardings
        params = shard_state(variables["params"], mesh)
        constants = replicate(variables.get("constants", {}), mesh)
        fwd = make_eval_forward(cfg, model, mesh, example_params=params)
        sp = cfg.TPU.SEQUENCE_PARALLEL
        device_split = eval_device_split_active(cfg)
        for sig, samples in sorted(sigs.items()):
            t0 = time.perf_counter()
            batch, _, meta = loader._make_batch(samples)
            if device_split:
                placed = shard_batch(batch, mesh, sequence_parallel=sp)
                out = fwd(params, constants, placed)
                fv = out["frame_valid"]
                # stacked row order is [stream0 rows..., stream1 rows...];
                # ori_size is per clip, identical across its two streams
                orig = np.asarray(
                    [m["ori_size"] for m in meta] * 2, np.int32
                )
            else:
                b1, m1 = subsample_batch(batch, meta, 0)
                b2, m2 = subsample_batch(batch, meta, 1)
                placed = shard_batch(
                    stack_streams(b1, b2), mesh, sequence_parallel=sp
                )
                out = fwd(params, constants, placed)
                fv = placed.frame_valid
                orig = np.asarray(
                    [m["ori_size"] for m in m1 + m2], np.int32
                )
            res = _postprocess_jit(
                out["pred_boxes"], out["pred_sted"], orig, fv,
            )
            jax.device_get(res)
            compiled += 1
            logger.info(f"eval {sig}: {time.perf_counter() - t0:.1f}s")

    logger.info(
        f"precompiled {compiled} program(s) into "
        f"{jax.config.jax_compilation_cache_dir or '(in-process cache only)'}"
    )
    return compiled


if __name__ == "__main__":
    main()
