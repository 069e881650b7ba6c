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
    from ..core.mesh import mesh_from_config
    from ..data.loader import make_loader
    from ..eval import build_evaluator, do_eval
    from ..models import STCATNet
    from ..train.step import make_eval_forward

    cfg = default_config()
    if args.config_file:
        cfg = merge_from_file(cfg, args.config_file)
    if args.opts:
        cfg = merge_from_list(cfg, args.opts)

    from ..core.xla_cache import setup_compile_cache

    setup_compile_cache(cfg)

    logger = setup_logger("stcat_tpu", cfg.OUTPUT_DIR, rank=get_rank())
    mesh = mesh_from_config(cfg)
    logger.info(f"mesh axes: {dict(mesh.shape)}")
    model = STCATNet(cfg)

    if args.synthetic:
        from ..data.synthetic import make_synthetic_dataset

        dataset = make_synthetic_dataset(cfg, "test")
    else:
        from ..data.datasets import build_dataset

        dataset = build_dataset(cfg, "test")

    from ..train.step import init_variables

    loader = make_loader(cfg, dataset, mesh, "test")

    from ..data.tokenize import check_tokenizer_for_weights

    check_tokenizer_for_weights(cfg, loader.tokenizer, cfg.MODEL.WEIGHT,
                                what="evaluation")
    sample = next(iter(loader))
    variables = init_variables(
        cfg, model, jax.random.PRNGKey(0),
        jax.tree_util.tree_map(lambda x: x[:1], sample[0]),
    )
    params, constants = variables["params"], variables.get("constants", {})

    from ..train.checkpoint import load_weights_for_eval

    params, constants = load_weights_for_eval(
        cfg, params, constants, cfg.MODEL.WEIGHT, logger
    )

    # place over the mesh: replicated on 1-D, Megatron-TP-sharded on a
    # (data, model) mesh; also routes restored process-local arrays through
    # host numpy in multi-host runs (core/mesh.shard_state)
    from ..core.mesh import shard_state

    params = shard_state(params, mesh)
    constants = shard_state(constants, mesh)

    evaluator = build_evaluator(cfg, logger, "test")
    fwd = make_eval_forward(cfg, model, mesh, example_params=params)
    res = do_eval(cfg, model, params, constants, loader, evaluator, fwd, logger,
                  mesh=mesh)
    if res is not None:
        logger.info(f"results: {res}")
    return res


if __name__ == "__main__":
    main()
