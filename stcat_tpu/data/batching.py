"""Fixed-shape batch assembly: pad clips into VideoBatch/VideoTargets.

Shape policy (XLA compiles one program per distinct shape):
  - frame axis T padded up to a bucket from cfg.TPU.FRAME_BUCKETS;
  - spatial canvas (H, W) rounded up to a multiple of 64 over the batch, so
    the multi-scale augmentation of the reference (datasets/build.py:26-45)
    yields a small bounded set of compiled shapes instead of one per clip;
  - boxes stay normalized to the *unpadded* image: the mask-normalized sine
    position embedding makes valid-region coordinates invariant to padding.

Box targets become frame-aligned [T, 4] with a validity mask -- the jittable
equivalent of the reference's flat GT-span gather (criterion.py:160-171).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.batch import VideoBatch, VideoTargets


def round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def pick_bucket(t: int, buckets: Sequence[int]) -> int:
    for b in sorted(buckets):
        if t <= b:
            return b
    return round_up(t, 32)


def build_batch(
    samples: List[Dict],
    t_bucket: int,
    tokenizer,
    max_query_len: int,
    canvas: Optional[Tuple[int, int]] = None,
) -> Tuple[VideoBatch, VideoTargets, List[Dict]]:
    """Assemble transformed samples into fixed-shape pytrees.

    Each sample dict (from dataset __getitem__ after transforms):
        frames [T,h,w,3] float32 (normalized), boxes_cxcywh [Nspan,4],
        actioness [T], text str, and metadata keys (item_id, frame_ids,
        ori_size, qtype).
    """
    b = len(samples)
    if canvas is None:
        hmax = max(s["frames"].shape[1] for s in samples)
        wmax = max(s["frames"].shape[2] for s in samples)
        canvas = (round_up(hmax, 64), round_up(wmax, 64))
    hc, wc = canvas

    frames = np.zeros((b, t_bucket, hc, wc, 3), np.float32)
    frame_valid = np.zeros((b, t_bucket), bool)
    pixel_valid = np.zeros((b, t_bucket, hc, wc), bool)
    boxes = np.zeros((b, t_bucket, 4), np.float32)
    box_valid = np.zeros((b, t_bucket), bool)
    actioness = np.zeros((b, t_bucket), np.float32)
    temp_bound = np.zeros((b, 2), np.int32)
    meta = []

    for i, s in enumerate(samples):
        f = s["frames"]
        t, h, w, _ = f.shape
        assert t <= t_bucket and h <= hc and w <= wc, (f.shape, t_bucket, canvas)
        frames[i, :t, :h, :w] = f
        frame_valid[i, :t] = True
        pixel_valid[i, :t, :h, :w] = True
        act = np.asarray(s["actioness"], np.float32)
        actioness[i, :t] = act
        span = np.flatnonzero(act)
        temp_bound[i] = (span[0], span[-1])
        bx = np.asarray(s["boxes_cxcywh"], np.float32)
        assert len(bx) == span[-1] - span[0] + 1, (len(bx), span)
        boxes[i, span[0]: span[-1] + 1] = bx
        box_valid[i, span[0]: span[-1] + 1] = True
        meta.append(
            {
                "item_id": s.get("item_id"),
                "frame_ids": s.get("frame_ids"),
                "ori_size": s.get("ori_size"),
                "qtype": s.get("qtype", "none"),
                "duration": t,
            }
        )

    token_ids, token_valid = tokenizer([s["text"] for s in samples], max_query_len)

    batch = VideoBatch(
        frames=frames,
        frame_valid=frame_valid,
        pixel_valid=pixel_valid,
        token_ids=token_ids,
        token_valid=token_valid,
    )
    targets = VideoTargets(
        boxes=boxes, box_valid=box_valid, actioness=actioness, temp_bound=temp_bound
    )
    return batch, targets, meta
