"""Training CLI, flag-compatible with the reference launcher.

    python -m stcat_tpu.cli.train --config-file experiments/VidSTG/e2e_STCAT_R101_VidSTG.yaml \
        OUTPUT_DIR out/ DATA_DIR /data/vidstg

ref: scripts/train_net.py:246-322 (no torch.distributed.launch -- jax owns
the devices; multi-host pods call jax.distributed.initialize when
JAX_COORDINATOR is set).
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="STCAT-TPU training")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--use-seed", action="store_true", default=True)
    p.add_argument("--synthetic", action="store_true", help="train on the synthetic dataset")
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    if os.environ.get("JAX_COORDINATOR"):
        import jax

        jax.distributed.initialize()

    from ..config import default_config, merge_from_file, merge_from_list, save_config
    from ..core.dist import get_rank
    from ..core.logging import setup_logger
    from ..train.loop import train

    cfg = default_config()
    if args.config_file:
        cfg = merge_from_file(cfg, args.config_file)
    if args.opts:
        cfg = merge_from_list(cfg, args.opts)

    from ..core.xla_cache import setup_compile_cache

    setup_compile_cache(cfg)

    logger = setup_logger("stcat_tpu", cfg.OUTPUT_DIR, rank=get_rank())
    logger.info(f"config file: {args.config_file}")
    if cfg.OUTPUT_DIR and get_rank() == 0:
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        save_config(cfg, os.path.join(cfg.OUTPUT_DIR, "config.yml"))

    dataset_builder = None
    if args.synthetic:
        from ..data.synthetic import make_synthetic_dataset

        dataset_builder = lambda c, split: make_synthetic_dataset(c, split)

    train(cfg, dataset_builder=dataset_builder, logger=logger, max_iters=args.max_iters)


if __name__ == "__main__":
    main()
