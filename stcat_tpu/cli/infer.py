"""One-shot grounding inference on a single clip: frames in, tube out.

The reference framework has no single-video tool -- evaluating one clip
means staging a dataset cache and running scripts/test_net.py over it
(reference scripts/test_net.py:60-103). This CLI grounds ONE natural-
language query on ONE clip from plain files, through the exact serving
path (stcat_tpu/serve.py GroundingPredictor: device-side preprocess,
stacked two-stream eval forward, reference postprocess + interpolation):

    python -m stcat_tpu.cli.infer --config-file experiments/VidSTG/e2e_STCAT_R101_VidSTG.yaml \
        --frames /path/to/frame_dir --query "a dog jumps over the fence" \
        [--out tube.json] [--draw outdir] MODEL.WEIGHT out/vidstg/checkpoints

(Config KEY VALUE opts are an argparse REMAINDER, like every CLI here: they
must come LAST -- anything after the first bare KEY is treated as opts.)

--frames accepts a directory of image files (sorted lexicographically;
img_00000.jpg ... -- the same layout the datasets' frame-dir decode branch
reads) or a .npy file of uint8 [T, H, W, 3] RGB. Output is a JSON tube:
{"query", "span": [start, end), "boxes": {frame_index: [x0, y0, x1, y1]}}
in original pixel coordinates; --draw renders the predicted box onto each
in-span frame as JPEGs for eyeballing.
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args():
    p = argparse.ArgumentParser(description="STCAT-TPU single-clip inference")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--frames", required=True,
                   help="directory of image frames or a .npy [T,H,W,3] uint8")
    p.add_argument("--query", required=True, help="natural-language sentence")
    p.add_argument("--weights", default="",
                   help="checkpoint dir / reference .pth (default MODEL.WEIGHT)")
    p.add_argument("--out", default="",
                   help="write the tube JSON here (default: stdout)")
    p.add_argument("--draw", default="",
                   help="also render the predicted box onto in-span frames "
                        "as JPEGs in this directory")
    p.add_argument("--stride", type=int, default=1,
                   help="take every Nth frame (long clips on small hosts)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def load_frames(path: str, stride: int = 1):
    """Returns (frames uint8 [T,H,W,3], frame_ids) from a dir or .npy."""
    import numpy as np

    if stride < 1:
        raise SystemExit(f"--stride must be >= 1, got {stride}")
    if os.path.isdir(path):
        from PIL import Image

        names = sorted(
            n for n in os.listdir(path)
            if n.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
        )
        if not names:
            raise SystemExit(f"no image files in {path}")
        names = names[::stride]
        frames = np.stack(
            [np.asarray(Image.open(os.path.join(path, n)).convert("RGB"))
             for n in names]
        )
        return frames.astype(np.uint8), [i * stride for i in range(len(names))]
    arr = np.load(path)
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise SystemExit(f"{path}: expected [T,H,W,3], got {arr.shape}")
    if arr.dtype != np.uint8:
        # a silent astype(uint8) would truncate normalized [0,1] floats to
        # 0/1 and emit a confident-but-garbage tube; rescale floats in [0,1],
        # reject everything else
        if np.issubdtype(arr.dtype, np.floating) and (
            arr.min() >= 0.0 and arr.max() <= 1.0
        ):
            arr = np.round(arr * 255.0)
        else:
            raise SystemExit(
                f"{path}: expected uint8 pixels (or floats in [0,1]), got "
                f"dtype {arr.dtype} with range [{arr.min()}, {arr.max()}]"
            )
    arr = arr[::stride]
    return arr.astype(np.uint8), [i * stride for i in range(arr.shape[0])]


def draw_tube(frames, result, out_dir: str) -> int:
    """Render the predicted box onto each in-span frame; returns count."""
    from PIL import Image, ImageDraw

    os.makedirs(out_dir, exist_ok=True)
    s, e = result["span"]
    n = 0
    for k, fid in enumerate(result["frame_ids"]):
        if not (s <= fid < e):
            continue
        box = result["boxes"].get(fid)
        if box is None:
            continue
        img = Image.fromarray(frames[k])
        d = ImageDraw.Draw(img)
        d.rectangle([box[0], box[1], box[2], box[3]], outline=(255, 32, 32),
                    width=max(2, img.width // 200))
        img.save(os.path.join(out_dir, f"tube_{fid:05d}.jpg"), quality=92)
        n += 1
    return n


def run(cfg, args, logger):
    from ..serve import GroundingPredictor

    frames, frame_ids = load_frames(args.frames, args.stride)
    logger.info(
        f"clip: {frames.shape[0]} frames {frames.shape[2]}x{frames.shape[1]}"
        f" | query: {args.query!r}"
    )
    predictor = GroundingPredictor(cfg, weights=args.weights, logger=logger)
    res = predictor.predict(frames, args.query, frame_ids=frame_ids)
    tube = {
        "query": args.query,
        "span": [int(res["span"][0]), int(res["span"][1])],
        "boxes": {int(f): [round(float(v), 2) for v in b]
                  for f, b in sorted(res["boxes"].items())},
        "frame_ids": frame_ids,
    }
    if args.draw:
        n = draw_tube(frames, tube, args.draw)
        logger.info(f"drew {n} annotated frame(s) into {args.draw}")
    payload = json.dumps(tube, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload + "\n")
        logger.info(f"tube written to {args.out}")
    else:
        print(payload)
    return tube


def main():
    args = parse_args()
    from ..config import default_config, merge_from_file, merge_from_list
    from ..core.logging import setup_logger
    from ..core.xla_cache import setup_compile_cache

    cfg = default_config()
    if args.config_file:
        cfg = merge_from_file(cfg, args.config_file)
    if args.opts:
        cfg = merge_from_list(cfg, args.opts)
    setup_compile_cache(cfg)
    # logs go to STDERR: without --out the tube JSON is this process's
    # stdout, and it must stay machine-readable (`... | jq .span`)
    import sys as _sys

    logger = setup_logger("stcat_tpu", cfg.OUTPUT_DIR, stream=_sys.stderr)
    return run(cfg, args, logger)


if __name__ == "__main__":
    main()
