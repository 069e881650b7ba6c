"""Host-side video clip transforms (numpy), mirroring the reference pipeline.

Reference: datasets/transforms.py + utils/bounding_box.py. Operates on a dict:
    frames     : float32 [T, H, W, 3] in [0, 1]
    boxes      : float32 [Nb, 4] xyxy in pixels (one per GT-span frame)
    text       : str
    actioness  : float32 [T]
Train pipeline (ref datasets/build.py:20-64): hflip (with left/right word swap
in the sentence) -> RandomSelect(multi-scale resize | resize+crop+resize) ->
normalize (ImageNet stats) + boxes to normalized cxcywh.

The transform is PLAN-BASED: `VideoTransform.plan` samples the augmentation
and applies the cheap host math (box geometry, text swap) up front, returning
a TransformPlan that describes the pixel work. Pixels are then produced one
of two ways:
  - `apply_pixels` replays the op chain on host float32 frames (the
    reference-exact legacy path, used by tests and HOST_TRANSFORM mode);
  - the plan's composed affine feeds the on-device resampler
    (ops/preprocess.py): the host ships raw uint8 frames and the TPU does
    flip/resize/crop/normalize inside the jitted step -- essential when the
    host is CPU-poor relative to the chip (SURVEY §7.5).

All randomness flows through an explicit np.random.Generator so workers are
reproducible and rank-seedable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def bilinear_resize(frames: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Separable bilinear resize of [T, H, W, C], half-pixel centers
    (torch F.resize / F.interpolate align_corners=False semantics)."""
    t, h, w, c = frames.shape
    if (h, w) == (out_h, out_w):
        return frames

    def axis_weights(n_in, n_out):
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
        lo = np.floor(src).astype(np.int64)
        frac = (src - lo).astype(np.float32)
        lo0 = np.clip(lo, 0, n_in - 1)
        lo1 = np.clip(lo + 1, 0, n_in - 1)
        return lo0, lo1, frac

    y0, y1, fy = axis_weights(h, out_h)
    x0, x1, fx = axis_weights(w, out_w)
    # resize H
    top = frames[:, y0]
    bot = frames[:, y1]
    fr = top + (bot - top) * fy[None, :, None, None]
    # resize W
    left = fr[:, :, x0]
    right = fr[:, :, x1]
    return left + (right - left) * fx[None, None, :, None]


def resize_keep_ratio(size: int, image_hw: Tuple[int, int], max_size: Optional[int]) -> Tuple[int, int]:
    """Target (h, w) for shortest-side resize with max cap. ref transforms.py:92-112."""
    h, w = image_hw
    if max_size is not None:
        min_orig, max_orig = float(min(h, w)), float(max(h, w))
        if max_orig / min_orig * size > max_size:
            size = int(round(max_size * min_orig / max_orig))
    if (w <= h and w == size) or (h <= w and h == size):
        return (h, w)
    if w < h:
        return (int(size * h / w), size)
    return (size, int(size * w / h))


def boxes_resize(boxes: np.ndarray, ratios: Tuple[float, float]) -> np.ndarray:
    rw, rh = ratios
    return boxes * np.asarray([rw, rh, rw, rh], np.float32)


def boxes_hflip(boxes: np.ndarray, width: float) -> np.ndarray:
    x0, y0, x1, y1 = boxes.T
    return np.stack([width - x1, y0, width - x0, y1], axis=1)


def boxes_crop(boxes: np.ndarray, region: Tuple[int, int, int, int]) -> np.ndarray:
    """region = (top, left, h, w). ref bounding_box.py:163-180."""
    top, left, h, w = region
    x0 = np.clip(boxes[:, 0] - left, 0, w)
    y0 = np.clip(boxes[:, 1] - top, 0, h)
    x1 = np.clip(boxes[:, 2] - left, 0, w)
    y1 = np.clip(boxes[:, 3] - top, 0, h)
    return np.stack([x0, y0, x1, y1], axis=1)


def crop_valid(boxes: np.ndarray, region) -> bool:
    c = boxes_crop(boxes, region)
    return bool(np.all((c[:, 0] < c[:, 2]) & (c[:, 1] < c[:, 3])))


def boxes_to_normalized_cxcywh(boxes: np.ndarray, image_hw: Tuple[int, int]) -> np.ndarray:
    h, w = image_hw
    x0, y0, x1, y1 = boxes.T
    x0, x1 = x0 / w, x1 / w
    y0, y1 = y0 / h, y1 / h
    return np.stack(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=1
    ).astype(np.float32)


IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def swap_left_right(text: str) -> str:
    """ref transforms.py:59 -- flips 'left'/'right' words in the sentence."""
    return (
        text.replace("right", "*&^special^&*")
        .replace("left", "right")
        .replace("*&^special^&*", "left")
    )


# --------------------------------------------------------------------------
# pipeline
# --------------------------------------------------------------------------

@dataclass
class TransformPlan:
    """Pixel work sampled by VideoTransform.plan, pixels not yet touched.

    ops is the reference-exact chain on the (post-flip) source image:
        ("resize", oh, ow) | ("crop", top, left, h, w)
    affine = (ay, by, ax, bx) is the chain composed into one affine map from
    output coords to post-flip source coords: y_src = ay*y_out + by (same for
    x). A single bilinear resample along this map is what the on-device
    resampler executes; it equals the chained resamples exactly for eval
    (one resize) and to sub-LSB smoothing differences for the train-aug
    resize->crop->resize branch (two stacked bilinears vs one combined --
    an augmentation-path-only deviation).
    """

    src_hw: Tuple[int, int]
    flip: bool
    ops: List[tuple]
    out_hw: Tuple[int, int]
    affine: Tuple[float, float, float, float]


def _compose_affine(ops: List[tuple], src_hw: Tuple[int, int]):
    """Fold the op chain into y_src = ay*y + by, x_src = ax*x + bx."""
    ay, by, ax, bx = 1.0, 0.0, 1.0, 0.0
    cur = src_hw
    for op in ops:
        if op[0] == "resize":
            oh, ow = op[1], op[2]
            ry, rx = cur[0] / oh, cur[1] / ow
            # x_old = (x_new + 0.5) * r - 0.5  (half-pixel centers)
            by, bx = ay * (0.5 * ry - 0.5) + by, ax * (0.5 * rx - 0.5) + bx
            ay, ax = ay * ry, ax * rx
            cur = (oh, ow)
        elif op[0] == "crop":
            top, left, ch, cw = op[1], op[2], op[3], op[4]
            by, bx = by + ay * top, bx + ax * left
            cur = (ch, cw)
        else:
            raise ValueError(op[0])
    return (ay, by, ax, bx), cur


def apply_pixels(frames: np.ndarray, plan: TransformPlan) -> np.ndarray:
    """Replay the op chain on host frames [T, H, W, C] (float32 or uint8).

    This is the reference-exact pixel path (flip + chained bilinear resizes +
    crops); the device path resamples once along plan.affine instead."""
    if plan.flip:
        frames = frames[:, :, ::-1]
    for op in plan.ops:
        if op[0] == "resize":
            frames = bilinear_resize(np.asarray(frames, np.float32), op[1], op[2])
        else:
            top, left, ch, cw = op[1], op[2], op[3], op[4]
            frames = frames[:, top: top + ch, left: left + cw]
    return np.ascontiguousarray(frames)


class VideoTransform:
    """Train/eval clip transform. Mutates and returns the sample dict."""

    def __init__(
        self,
        resolution: int,
        is_train: bool,
        aug_scale: bool = True,
        flip_prob: float = 0.5,
        max_size: int = 720,
        mean: np.ndarray = IMAGENET_MEAN,
        std: np.ndarray = IMAGENET_STD,
        aug_crop: bool = True,
    ):
        self.resolution = resolution
        self.is_train = is_train
        self.flip_prob = flip_prob
        self.max_size = max_size
        self.mean = mean
        self.std = std
        self.aug_crop = aug_crop
        if aug_scale:
            self.scales = [resolution - 32 * i for i in range(4) if resolution - 32 * i > 0]
        else:
            self.scales = [resolution]

    def _sample_crop(self, hw, boxes, rng, min_size=384, max_size=600, max_try=50):
        """RandomSizeCrop region with box-validity retry (ref
        transforms.py:128-152); None = no crop this draw."""
        h, w = hw
        for _ in range(max_try):
            tw = int(rng.integers(min_size, min(w, max_size) + 1))
            th = int(rng.integers(min_size, min(h, max_size) + 1))
            if th >= h and tw >= w:
                return None
            top = int(rng.integers(0, max(h - th, 0) + 1))
            left = int(rng.integers(0, max(w - tw, 0) + 1))
            region = (top, left, min(th, h), min(tw, w))
            if crop_valid(boxes, region):
                return region
        return None

    def plan(
        self, src_hw: Tuple[int, int], boxes: np.ndarray, text: str,
        rng: np.random.Generator,
    ) -> Tuple[TransformPlan, np.ndarray, str]:
        """Sample the augmentation; transform boxes/text now, defer pixels.

        Returns (plan, boxes_xyxy_out, text_out). The box math is the exact
        reference chain (resize/crop/flip on BoxList), so box targets are
        identical no matter which pixel path executes the plan.
        """
        h, w = src_hw
        flip = False
        if self.is_train and rng.random() < self.flip_prob:
            flip = True
            boxes = boxes_hflip(boxes, w)
            text = swap_left_right(text)
        ops: List[tuple] = []
        cur = (h, w)

        def add_resize(size: int, max_size: Optional[int]):
            nonlocal cur, boxes
            oh, ow = resize_keep_ratio(size, cur, max_size)
            boxes = boxes_resize(boxes, (ow / cur[1], oh / cur[0]))
            if (oh, ow) != cur:
                ops.append(("resize", oh, ow))
                cur = (oh, ow)

        if self.is_train:
            if (not self.aug_crop) or rng.random() < 0.5:
                add_resize(int(rng.choice(self.scales)), self.max_size)
            else:
                add_resize(int(rng.choice([400, 500, 600])), None)
                region = self._sample_crop(cur, boxes, rng)
                if region is not None:
                    top, left, ch, cw = region
                    boxes = boxes_crop(boxes, region)
                    ops.append(("crop", top, left, ch, cw))
                    cur = (ch, cw)
                add_resize(int(rng.choice(self.scales)), self.max_size)
        else:
            add_resize(self.resolution, self.max_size)

        affine, out_hw = _compose_affine(ops, (h, w))
        assert out_hw == cur, (out_hw, cur)
        return TransformPlan(
            src_hw=(h, w), flip=flip, ops=ops, out_hw=cur, affine=affine
        ), boxes, text

    def __call__(self, sample: Dict, rng: np.random.Generator) -> Dict:
        plan, boxes, text = self.plan(
            sample["frames"].shape[1:3], sample["boxes"], sample["text"], rng
        )
        frames = apply_pixels(sample["frames"], plan)
        # normalize pixels + boxes (ref transforms.py:155-168)
        sample["frames"] = (np.asarray(frames, np.float32) - self.mean) / self.std
        sample["boxes"] = boxes
        sample["text"] = text
        sample["boxes_cxcywh"] = boxes_to_normalized_cxcywh(boxes, plan.out_hw)
        return sample


def build_transforms(cfg, is_train: bool) -> VideoTransform:
    return VideoTransform(
        resolution=cfg.INPUT.RESOLUTION,
        is_train=is_train,
        aug_scale=cfg.INPUT.AUG_SCALE,
        flip_prob=cfg.INPUT.FLIP_PROB_TRAIN,
        mean=np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32),
        std=np.asarray(cfg.INPUT.PIXEL_STD, np.float32),
        aug_crop=cfg.INPUT.AUG_CROP,
    )
