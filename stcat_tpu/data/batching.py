"""Fixed-shape batch assembly: pad clips into VideoBatch/VideoTargets.

Shape policy (XLA compiles one program per distinct shape):
  - frame axis T padded up to a bucket from cfg.TPU.FRAME_BUCKETS;
  - spatial canvas (H, W) rounded up to a multiple of CANVAS_QUANT=32 (the
    backbone's total stride, so feature grids stay integral) over the batch:
    the multi-scale augmentation of the reference (datasets/build.py:26-45)
    yields a small bounded set of compiled shapes instead of one per clip,
    and the eval path at RESOLUTION=416 pads zero rows instead of 32;
  - boxes stay normalized to the *unpadded* image: the mask-normalized sine
    position embedding makes valid-region coordinates invariant to padding.

Box targets become frame-aligned [T, 4] with a validity mask -- the jittable
equivalent of the reference's flat GT-span gather (criterion.py:160-171).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.batch import RawVideoBatch, VideoBatch, VideoTargets


CANVAS_QUANT = 32  # target canvas quantum = backbone total stride
# raw (uint8) SOURCE canvases quantize coarsely: video resolutions vary
# continuously across a real corpus and each distinct source shape is a
# compiled program; 64-px buckets bound the compile count (standard video
# sizes -- 240/320/480/640/720 -- mostly land on or just above multiples of
# 64) while keeping the padding waste the host->device DMA ships low (128-px
# buckets pad a 320x240 source by +28% bytes, 64-px by +7%; the resampler's
# out_size masks the pad away either way)
SRC_CANVAS_QUANT = 64


def round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def pick_bucket(t: int, buckets: Sequence[int]) -> int:
    for b in sorted(buckets):
        if t <= b:
            return b
    return round_up(t, 32)


def _build_targets(samples: List[Dict], t_bucket: int):
    """Frame-aligned targets + meta shared by both batch builders."""
    b = len(samples)
    boxes = np.zeros((b, t_bucket, 4), np.float32)
    box_valid = np.zeros((b, t_bucket), bool)
    actioness = np.zeros((b, t_bucket), np.float32)
    temp_bound = np.zeros((b, 2), np.int32)
    frame_valid = np.zeros((b, t_bucket), bool)
    meta = []
    for i, s in enumerate(samples):
        t = len(s["actioness"])
        assert t <= t_bucket, (t, t_bucket)
        frame_valid[i, :t] = True
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
                # eval wrap-around filler rows: forwarded (fixed shapes) but
                # never fed to the evaluator (data/loader.py _eval_iter)
                "pad": bool(s.get("pad", False)),
            }
        )
    targets = VideoTargets(
        boxes=boxes, box_valid=box_valid, actioness=actioness, temp_bound=temp_bound
    )
    return targets, frame_valid, meta


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
        canvas = (round_up(hmax, CANVAS_QUANT), round_up(wmax, CANVAS_QUANT))
    hc, wc = canvas

    frames = np.zeros((b, t_bucket, hc, wc, 3), np.float32)
    pixel_valid = np.zeros((b, t_bucket, hc, wc), bool)
    targets, frame_valid, meta = _build_targets(samples, t_bucket)

    for i, s in enumerate(samples):
        f = s["frames"]
        t, h, w, _ = f.shape
        assert t <= t_bucket and h <= hc and w <= wc, (f.shape, t_bucket, canvas)
        frames[i, :t, :h, :w] = f
        pixel_valid[i, :t, :h, :w] = True

    token_ids, token_valid = tokenizer([s["text"] for s in samples], max_query_len)

    batch = VideoBatch(
        frames=frames,
        frame_valid=frame_valid,
        pixel_valid=pixel_valid,
        token_ids=token_ids,
        token_valid=token_valid,
    )
    return batch, targets, meta


def raw_canvases(samples: List[Dict]) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """(src_canvas, out_canvas) for a raw sample batch -- the quantized
    static shapes that, with the frame bucket, form the jit cache key."""
    pix_key = "frames_y" if "frames_y" in samples[0] else "frames_u8"
    hs = max(s[pix_key].shape[1] for s in samples)
    ws = max(s[pix_key].shape[2] for s in samples)
    ho = max(s["plan"].out_hw[0] for s in samples)
    wo = max(s["plan"].out_hw[1] for s in samples)
    return (
        (round_up(hs, SRC_CANVAS_QUANT), round_up(ws, SRC_CANVAS_QUANT)),
        (round_up(ho, CANVAS_QUANT), round_up(wo, CANVAS_QUANT)),
    )


def raw_batch_signature(samples: List[Dict], buckets: Sequence[int]) -> tuple:
    """Hashable compiled-shape signature of the batch build_raw_batch would
    assemble from these samples: (B, t_bucket, src_canvas, out_canvas,
    layout). Two batches with equal signatures hit the same compiled
    program (RawVideoBatch geometry doc, core/batch.py)."""
    t_bucket = pick_bucket(max(len(s["actioness"]) for s in samples), buckets)
    src_canvas, out_canvas = raw_canvases(samples)
    layout = "yuv420" if "frames_y" in samples[0] else "rgb"
    return (len(samples), t_bucket, src_canvas, out_canvas, layout)


def build_raw_batch(
    samples: List[Dict],
    t_bucket: int,
    tokenizer,
    max_query_len: int,
    src_canvas: Optional[Tuple[int, int]] = None,
    out_canvas: Optional[Tuple[int, int]] = None,
) -> Tuple[RawVideoBatch, VideoTargets, List[Dict]]:
    """Assemble RAW samples (uint8 pixels + TransformPlan) for the on-device
    pixel path (ops/preprocess.py). Box/actioness targets are identical to
    build_batch's -- the plan already did the reference box math on host.

    Each raw sample dict: frames_u8 [T,h,w,3] uint8 (decoded, untransformed),
    plan (TransformPlan), boxes_cxcywh, actioness, text, metadata keys.
    """
    b = len(samples)
    yuv = "frames_y" in samples[0]
    pix_key = "frames_y" if yuv else "frames_u8"
    auto_src, auto_out = raw_canvases(samples)
    src_canvas = src_canvas or auto_src
    out_canvas = out_canvas or auto_out
    hs, ws = src_canvas

    if yuv:
        frames_u8 = None
        frames_y = np.zeros((b, t_bucket, hs, ws), np.uint8)
        frames_cbcr = np.zeros((b, t_bucket, hs // 2, ws // 2, 2), np.uint8)
    else:
        frames_u8 = np.zeros((b, t_bucket, hs, ws, 3), np.uint8)
        frames_y = frames_cbcr = None
    flip = np.zeros((b,), bool)
    affine_scale = np.zeros((b, 2), np.float32)
    affine_off = np.zeros((b, 2), np.float32)
    out_size = np.zeros((b, 2), np.int32)
    targets, frame_valid, meta = _build_targets(samples, t_bucket)

    def _place(dst_i, f, t, h, w, hcap):
        # copy + replicate the boundary row/col once so the resampler's
        # edge taps clamp instead of blending into the zero padding
        # (canvas-boundary taps are already clamp-equivalent via kernel
        # renormalization)
        dst_i[:t, :h, :w] = f
        if h < hcap:
            dst_i[:t, h, :w] = f[:, h - 1]
        if w < dst_i.shape[2]:
            dst_i[:t, : min(h + 1, hcap), w] = \
                dst_i[:t, : min(h + 1, hcap), w - 1]

    for i, s in enumerate(samples):
        f = s[pix_key]
        plan = s["plan"]
        t, h, w = f.shape[:3]
        assert t <= t_bucket and h <= hs and w <= ws, (f.shape, t_bucket, src_canvas)
        if yuv:
            _place(frames_y[i], f, t, h, w, hs)
            c = s["frames_cbcr"]
            _place(frames_cbcr[i], c, t, c.shape[1], c.shape[2], hs // 2)
        else:
            _place(frames_u8[i], f, t, h, w, hs)
        ay, by, ax, bx = plan.affine
        if plan.flip:
            # the device flips the whole source canvas, which lands the
            # frame's pixels at x in [ws - w, ws): shift the sampling window
            bx += ws - w
        flip[i] = plan.flip
        affine_scale[i] = (ay, ax)
        affine_off[i] = (by, bx)
        out_size[i] = plan.out_hw

    token_ids, token_valid = tokenizer([s["text"] for s in samples], max_query_len)

    batch = RawVideoBatch(
        frames_u8=frames_u8,
        frames_y=frames_y,
        frames_cbcr=frames_cbcr,
        frame_valid=frame_valid,
        flip=flip,
        affine_scale=affine_scale,
        affine_off=affine_off,
        out_size=out_size,
        token_ids=token_ids,
        token_valid=token_valid,
        out_canvas=(int(out_canvas[0]), int(out_canvas[1])),
    )
    return batch, targets, meta
