"""Convert a reference/MDETR torch checkpoint into a framework checkpoint.

    python -m stcat_tpu.cli.convert --src hcstvg_res448.pth \
        --config-file experiments/HC-STVG/e2e_STCAT_R101_HCSTVG.yaml \
        --out out/converted [KEY VALUE ...]

The output directory then works directly as MODEL.WEIGHT for cli.test /
resume-style loading (EMA slot initialized to the converted weights,
matching ref utils/checkpoint.py:193-194).
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="STCAT-TPU checkpoint converter")
    p.add_argument("--src", required=True, help="torch .pth checkpoint")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--out", required=True, help="output checkpoint directory")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import numpy as np

    from ..config import default_config, merge_from_file, merge_from_list
    from ..core.logging import setup_logger
    from ..models import STCATNet
    from ..train.checkpoint import Checkpointer, load_torch_file
    from ..train.convert_reference import (
        convert_reference_stcat,
        merge_partial,
        remap_mdetr,
    )

    cfg = default_config()
    if args.config_file:
        cfg = merge_from_file(cfg, args.config_file)
    if args.opts:
        cfg = merge_from_list(cfg, args.opts)

    logger = setup_logger("stcat_tpu.convert", args.out)
    sd = load_torch_file(args.src)
    is_mdetr = any(k.startswith("transformer.") for k in sd)

    if is_mdetr:
        logger.info("MDETR-style checkpoint: partial init over fresh weights")
        from ..core.batch import VideoBatch

        model = STCATNet(cfg)
        t, r = 8, 64
        dummy = VideoBatch(
            frames=np.zeros((1, t, r, r, 3), np.float32),
            frame_valid=np.ones((1, t), bool),
            pixel_valid=np.ones((1, t, r, r), bool),
            token_ids=np.ones((1, 8), np.int32),
            token_valid=np.ones((1, 8), bool),
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(cfg.SEED), dummy)
        partial, constants, _ = convert_reference_stcat(remap_mdetr(sd), cfg, strict=False)
        params = merge_partial(variables["params"], partial)
        constants = merge_partial(variables.get("constants", {}), constants)
    else:
        params, constants, unused = convert_reference_stcat(sd, cfg)
        if unused:
            logger.warning(f"{len(unused)} keys unconverted: {sorted(unused)[:5]} ...")

    from ..train.step import TrainState

    state = TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        constants=constants,
        opt_state=(),  # converted checkpoints carry no optimizer state
        ema_params=jax.tree_util.tree_map(np.asarray, params),
    )
    ckpt = Checkpointer(args.out, logger)
    ckpt.save(0, state, block=True)  # one-shot CLI: commit before exiting
    # provenance marker: eval/infer hard-fail on this checkpoint under the
    # stand-in hash tokenizer (data/tokenize.check_tokenizer_for_weights)
    import json

    with open(os.path.join(args.out, "provenance.json"), "w") as f:
        json.dump({"converted_from_reference": True, "src": args.src,
                   "mdetr_partial_init": bool(is_mdetr)}, f)
    logger.info(f"converted checkpoint written to {args.out}/checkpoints")


if __name__ == "__main__":
    main()
