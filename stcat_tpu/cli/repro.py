"""One-command reference reproduction: convert a released checkpoint,
evaluate it, and print the metrics against the reference model-zoo targets.

    python -m stcat_tpu.cli.repro \
        --weights vidstg_res448.pth \
        --data-dir /data/vidstg \
        --tokenizer-dir /assets/roberta-base \
        --config-file experiments/VidSTG/e2e_STCAT_R101_VidSTG.yaml \
        [KEY VALUE ...]

The model-zoo targets come from the reference README (README.md:129-135);
--require-within P makes the process exit non-zero when any compared
metric lands more than P points below its target (repro gate for CI with
the real assets). Everything this needs (converter, evaluator, tokenizer
guard) is exercised end-to-end by tests/test_repro.py over the synthetic
cache and a synthetic reference-shaped state_dict.
"""

from __future__ import annotations

import argparse
import json
import sys

# (dataset, resolution) -> {metric_key: published value}
# ref README.md:129-135 (m_vIoU; VidSTG split per question type)
MODEL_ZOO = {
    ("VidSTG", 416): {"declar_viou": 32.94, "inter_viou": 27.87},
    ("VidSTG", 448): {"declar_viou": 33.14, "inter_viou": 28.22},
    ("HC-STVG", 416): {"viou": 34.93},
    ("HC-STVG", 448): {"viou": 35.09},
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="STCAT-TPU reference repro")
    p.add_argument("--weights", required=True,
                   help="reference .pth checkpoint (or converted ckpt dir)")
    p.add_argument("--data-dir", required=True,
                   help="dataset root (annotations + videos/frames)")
    p.add_argument("--tokenizer-dir", default="",
                   help="local roberta-base dir (vocab.json/merges.txt)")
    p.add_argument("--config-file", default="", metavar="FILE",
                   help="experiment YAML (defaults to the dataset's recipe)")
    p.add_argument("--require-within", type=float, default=None, metavar="PTS",
                   help="exit 1 if any metric is more than PTS below target")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (tests/stand-ins)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args(argv)


def run(args) -> dict:
    from ..config import default_config, merge_from_file, merge_from_list

    cfg = default_config()
    if args.config_file:
        cfg = merge_from_file(cfg, args.config_file)
    overrides = [
        "DATA_DIR", args.data_dir,
        "MODEL.WEIGHT", args.weights,
    ]
    if args.tokenizer_dir:
        overrides += ["MODEL.TEXT_MODEL.LOCAL_PATH", args.tokenizer_dir]
    cfg = merge_from_list(cfg, overrides)
    if args.opts:
        cfg = merge_from_list(cfg, args.opts)

    # the eval flow IS cli.test's: rebuild its argv and let it run (model
    # init, weight conversion, tokenizer guard, do_eval, summarize)
    from .test import main as test_main

    argv = ["test"]
    if args.config_file:
        argv += ["--config-file", args.config_file]
    if args.synthetic:
        argv += ["--synthetic"]
    argv += overrides + list(args.opts or [])
    old_argv = sys.argv
    sys.argv = argv
    try:
        res = test_main()
    finally:
        sys.argv = old_argv
    if res is None:
        raise RuntimeError("evaluation returned no metrics (non-main rank?)")

    dataset = cfg.DATASET.NAME
    resolution = int(cfg.INPUT.RESOLUTION)
    targets = MODEL_ZOO.get((dataset, resolution))
    report = {
        "dataset": dataset,
        "resolution": resolution,
        "weights": args.weights,
        "metrics": {k: round(100.0 * v, 2) for k, v in res.items()},
        "targets": targets or {},
        "deltas": {},
    }
    if targets is None:
        report["note"] = (
            f"no model-zoo target for {dataset}@{resolution} "
            "(reference publishes 416/448 only, README.md:129-135)"
        )
    else:
        for k, tgt in targets.items():
            if k in res:
                report["deltas"][k] = round(100.0 * res[k] - tgt, 2)
    return report


def main(argv=None):
    args = parse_args(argv)
    report = run(args)
    print(json.dumps(report, indent=2))
    if args.require_within is not None and report["targets"]:
        worst = min(report["deltas"].values(), default=0.0)
        if worst < -args.require_within:
            print(
                f"FAIL: worst metric delta {worst:+.2f} pts is below the "
                f"--require-within {args.require_within} gate",
                file=sys.stderr,
            )
            raise SystemExit(1)
    return report


if __name__ == "__main__":
    main()
