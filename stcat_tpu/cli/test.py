"""Evaluation CLI. ref: scripts/test_net.py:17-104.

    python -m stcat_tpu.cli.test --config-file experiments/... \
        MODEL.WEIGHT out/checkpoints OUTPUT_DIR out/
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="STCAT-TPU evaluation")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    if os.environ.get("JAX_COORDINATOR"):
        import jax

        jax.distributed.initialize()

    import jax

    from ..config import default_config, merge_from_file, merge_from_list
    from ..core.dist import get_rank
    from ..core.logging import setup_logger
    from ..core.mesh import make_mesh
    from ..data.loader import make_loader
    from ..eval import build_evaluator, do_eval
    from ..models import STCATNet
    from ..train.checkpoint import Checkpointer
    from ..train.step import make_eval_forward

    cfg = default_config()
    if args.config_file:
        cfg = merge_from_file(cfg, args.config_file)
    if args.opts:
        cfg = merge_from_list(cfg, args.opts)

    # Persistent compile cache: multi-scale training compiles one program
    # per 64-px canvas bucket, and each compile costs minutes on TPU
    # platforms with remote compilation -- default the cache into
    # OUTPUT_DIR so restarts and preemption-resumes skip all of it.
    # TPU.COMPILE_CACHE_DIR 'off' disables; any other value overrides.
    cache_dir = cfg.TPU.COMPILE_CACHE_DIR
    if not cache_dir and cfg.OUTPUT_DIR:
        cache_dir = os.path.join(cfg.OUTPUT_DIR, "compile_cache")
    if cache_dir and cache_dir != "off":
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    logger = setup_logger("stcat_tpu", cfg.OUTPUT_DIR, rank=get_rank())
    mesh = make_mesh(cfg.TPU.MESH_DATA, model_parallel=cfg.TPU.MODEL_PARALLEL)
    model = STCATNet(cfg)

    if args.synthetic:
        from ..data.synthetic import make_synthetic_dataset

        dataset = make_synthetic_dataset(cfg, "test")
    else:
        from ..data.datasets import build_dataset

        dataset = build_dataset(cfg, "test")

    loader = make_loader(cfg, dataset, mesh, "test")
    sample = next(iter(loader))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jax.tree_util.tree_map(lambda x: x[:1], sample[0])
    )
    params, constants = variables["params"], variables.get("constants", {})

    weight = cfg.MODEL.WEIGHT
    if weight and weight.endswith((".pth", ".pt", ".bin")):
        # direct torch checkpoint: convert in-memory (reference naming)
        from ..train.checkpoint import load_torch_file
        from ..train.convert_reference import convert_reference_stcat

        sd = load_torch_file(weight)
        params, constants, unused = convert_reference_stcat(sd, cfg)
        if unused:
            logger.warning(f"{len(unused)} keys unconverted")
        logger.info(f"converted torch weights from {weight}")
    elif weight:
        # framework checkpoint dir (OUTPUT_DIR or OUTPUT_DIR/checkpoints)
        base = weight.rstrip("/")
        if base.endswith("checkpoints"):
            base = os.path.dirname(base)
        ckpt = Checkpointer(base, logger)
        params, constants = ckpt.restore_for_eval(params, constants)
        logger.info(f"loaded weights from {weight} (EMA preferred)")

    evaluator = build_evaluator(cfg, logger, "test")
    fwd = make_eval_forward(cfg, model, mesh, example_params=params)
    res = do_eval(cfg, model, params, constants, loader, evaluator, fwd, logger)
    if res is not None:
        logger.info(f"results: {res}")
    return res


if __name__ == "__main__":
    main()
