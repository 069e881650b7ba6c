"""Host-side video clip transforms (numpy), mirroring the reference pipeline.

Reference: datasets/transforms.py + utils/bounding_box.py. Operates on a dict:
    frames     : float32 [T, H, W, 3] in [0, 1]
    boxes      : float32 [Nb, 4] xyxy in pixels (one per GT-span frame)
    text       : str
    actioness  : float32 [T]
Train pipeline (ref datasets/build.py:20-64): hflip (with left/right word swap
in the sentence) -> RandomSelect(multi-scale resize | resize+crop+resize) ->
normalize (ImageNet stats) + boxes to normalized cxcywh.

All randomness flows through an explicit np.random.Generator so workers are
reproducible and rank-seedable.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

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
    ):
        self.resolution = resolution
        self.is_train = is_train
        self.flip_prob = flip_prob
        self.max_size = max_size
        self.mean = mean
        self.std = std
        if aug_scale:
            self.scales = [resolution - 32 * i for i in range(4) if resolution - 32 * i > 0]
        else:
            self.scales = [resolution]

    def _resize_to(self, sample: Dict, size: int, max_size: Optional[int]) -> Dict:
        t, h, w, _ = sample["frames"].shape
        oh, ow = resize_keep_ratio(size, (h, w), max_size)
        sample["frames"] = bilinear_resize(sample["frames"], oh, ow)
        sample["boxes"] = boxes_resize(sample["boxes"], (ow / w, oh / h))
        return sample

    def _random_size_crop(self, sample: Dict, rng, min_size=384, max_size=600, max_try=50):
        """ref transforms.py:128-152."""
        for _ in range(max_try):
            t, h, w, _ = sample["frames"].shape
            tw = int(rng.integers(min_size, min(w, max_size) + 1))
            th = int(rng.integers(min_size, min(h, max_size) + 1))
            if th >= h and tw >= w:
                return sample
            top = int(rng.integers(0, max(h - th, 0) + 1))
            left = int(rng.integers(0, max(w - tw, 0) + 1))
            region = (top, left, min(th, h), min(tw, w))
            if crop_valid(sample["boxes"], region):
                top, left, ch, cw = region
                sample["frames"] = sample["frames"][:, top: top + ch, left: left + cw]
                sample["boxes"] = boxes_crop(sample["boxes"], region)
                return sample
        return sample

    def __call__(self, sample: Dict, rng: np.random.Generator) -> Dict:
        if self.is_train:
            if rng.random() < self.flip_prob:
                sample["frames"] = sample["frames"][:, :, ::-1].copy()
                w = sample["frames"].shape[2]
                sample["boxes"] = boxes_hflip(sample["boxes"], w)
                sample["text"] = swap_left_right(sample["text"])
            if rng.random() < 0.5:
                size = int(rng.choice(self.scales))
                sample = self._resize_to(sample, size, self.max_size)
            else:
                size = int(rng.choice([400, 500, 600]))
                sample = self._resize_to(sample, size, None)
                sample = self._random_size_crop(sample, rng)
                size = int(rng.choice(self.scales))
                sample = self._resize_to(sample, size, self.max_size)
        else:
            sample = self._resize_to(sample, self.resolution, self.max_size)

        # normalize pixels + boxes (ref transforms.py:155-168)
        sample["frames"] = (sample["frames"] - self.mean) / self.std
        h, w = sample["frames"].shape[1:3]
        sample["boxes_cxcywh"] = boxes_to_normalized_cxcywh(sample["boxes"], (h, w))
        return sample


def build_transforms(cfg, is_train: bool) -> VideoTransform:
    return VideoTransform(
        resolution=cfg.INPUT.RESOLUTION,
        is_train=is_train,
        aug_scale=cfg.INPUT.AUG_SCALE,
        flip_prob=cfg.INPUT.FLIP_PROB_TRAIN,
        mean=np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32),
        std=np.asarray(cfg.INPUT.PIXEL_STD, np.float32),
    )
