"""Dataset classes: cache-backed VidSTG / HC-STVG and a synthetic twin.

__getitem__ returns a transformed sample dict ready for batching.build_batch:
    frames [T,h,w,3] float32 in normalized space, boxes_cxcywh [Nspan,4],
    actioness [T], text, item_id, frame_ids, ori_size, qtype.

ref: datasets/vidstg.py:154-198, datasets/hcstvg.py:94-137.
"""

from __future__ import annotations

import os
from copy import deepcopy
from typing import Dict, List, Optional

import numpy as np

from ..config import Config
from .annotations import load_or_build_cache
from .decode import decode_frames, load_frame_images
from .sampling import gt_box_alignment, make_hcstvg_input_clip, make_vidstg_input_clip
from .transforms import (
    VideoTransform,
    boxes_to_normalized_cxcywh,
    build_transforms,
)


class GroundingDataset:
    """Common machinery for both benchmarks."""

    # the loader may request raw uint8 samples + TransformPlan
    # (cfg.TPU.DEVICE_PREPROCESS) instead of host-transformed floats
    supports_raw = True

    def __init__(self, cfg: Config, split: str, transforms: Optional[VideoTransform] = None):
        self.cfg = cfg
        self.split = split
        self.transforms = transforms or build_transforms(cfg, split == "train")
        self.data_dir = cfg.DATA_DIR
        self.items, self.annos = load_or_build_cache(
            cfg.DATA_DIR, cfg.DATASET.NAME, split, seed=cfg.SEED
        )
        if cfg.DATA_TRUNK is not None:
            self.items = self.items[: cfg.DATA_TRUNK]

    def __len__(self) -> int:
        return len(self.items)

    # -- hooks ------------------------------------------------------------
    def sample_clip(self, item: Dict, rng) -> Dict:
        raise NotImplementedError

    def video_path(self, item: Dict) -> str:
        raise NotImplementedError

    _frame_pool = None  # class-level shared native decode pool

    @classmethod
    def _native_pool(cls):
        if cls._frame_pool is None:
            from . import native_decode

            if native_decode.available():
                cls._frame_pool = native_decode.FramePool(workers=4)
            else:
                cls._frame_pool = False
        return cls._frame_pool or None

    def load_frames(self, item: Dict) -> np.ndarray:
        """uint8 [T, H, W, 3] for the sampled frame_ids."""
        frame_dir = os.path.join(self.data_dir, "frame")
        if os.path.isdir(os.path.join(frame_dir, str(item["vid"]))):
            return load_frame_images(
                frame_dir, str(item["vid"]), item["frame_ids"],
                hw=(item["height"], item["width"]),
            )
        pool = self._native_pool()
        if pool is not None:
            from .native_decode import decode_frames_native

            try:
                return decode_frames_native(
                    pool, self.video_path(item), item["frame_ids"],
                    item["height"], item["width"],
                )
            except RuntimeError:
                pass  # fall back to the subprocess path (with retries)
        return decode_frames(
            self.video_path(item), item["frame_ids"], item["height"], item["width"]
        )

    def load_frames_yuv(self, item: Dict):
        """4:2:0 planes (y, cbcr) for the sampled frame_ids (raw ingest with
        cfg.TPU.INGEST_LAYOUT "yuv420" -- half the host->device bytes of
        RGB; JPEG/H.264 sources store 4:2:0 natively). Frame-dir sources
        decode straight to the codec's YCbCr; video sources convert the
        decoded RGB on host (decode.rgb_to_yuv420)."""
        frame_dir = os.path.join(self.data_dir, "frame")
        if os.path.isdir(os.path.join(frame_dir, str(item["vid"]))):
            from .decode import load_frame_images_yuv

            return load_frame_images_yuv(
                frame_dir, str(item["vid"]), item["frame_ids"],
                hw=(item["height"], item["width"]),
            )
        from .decode import rgb_to_yuv420

        return rgb_to_yuv420(self.load_frames(item))

    # ---------------------------------------------------------------------
    def __getitem__(
        self,
        index: int,
        rng: Optional[np.random.Generator] = None,
        raw: bool = False,
        plan_only: bool = False,
    ) -> Dict:
        """raw=True: return uint8 frames + a TransformPlan for the on-device
        pixel path (cfg.TPU.DEVICE_PREPROCESS); the box/text math is done
        here either way, so targets are identical across both modes.

        plan_only=True (implies raw): skip pixel decoding and return
        zero-filled arrays of the exact decode shapes. The sample is
        shape-identical to the raw one (the rng stream is shared: the plan
        draws before decode, and decode consumes no randomness), so batch
        assembly and jit signatures match -- used by Loader.scan_signatures
        / cli.precompile to enumerate compiled shapes without touching
        pixels."""
        rng = rng or np.random.default_rng()
        raw = raw or plan_only
        item = self.sample_clip(deepcopy(self.items[index]), rng)
        boxes = gt_box_alignment(item)  # [Nspan, 4] xyxy pixels
        meta = {
            "actioness": np.asarray(item["actioness"], np.float32),
            "item_id": item["item_id"],
            "frame_ids": item["frame_ids"],
            "ori_size": (item["height"], item["width"]),
            "qtype": item.get("qtype", "none"),
        }
        if raw:
            # plan first (draws the same rng stream as the legacy path:
            # decode consumes no randomness), pixels stay uint8
            plan, boxes_out, text = self.transforms.plan(
                (item["height"], item["width"]),
                boxes,
                item["description"].lower(),
                rng,
            )
            t = len(item["frame_ids"])
            h, w = item["height"], item["width"]
            if self.cfg.TPU.INGEST_LAYOUT == "yuv420":
                if plan_only:
                    # decode.rgb_to_yuv420 / the native decoder emit
                    # ceil-halved chroma planes
                    y = np.zeros((t, h, w), np.uint8)
                    cbcr = np.zeros(
                        (t, (h + 1) // 2, (w + 1) // 2, 2), np.uint8
                    )
                else:
                    y, cbcr = self.load_frames_yuv(item)
                pixels = {"frames_y": y, "frames_cbcr": cbcr}
            elif plan_only:
                pixels = {"frames_u8": np.zeros((t, h, w, 3), np.uint8)}
            else:
                pixels = {"frames_u8": self.load_frames(item)}
            return {
                **pixels,
                "plan": plan,
                "boxes": boxes_out,
                "boxes_cxcywh": boxes_to_normalized_cxcywh(boxes_out, plan.out_hw),
                "text": text,
                **meta,
            }
        frames = self.load_frames(item).astype(np.float32) / 255.0
        sample = {
            "frames": frames,
            "boxes": boxes,
            "text": item["description"].lower(),
            **meta,
        }
        return self.transforms(sample, rng)


class VidSTGDataset(GroundingDataset):
    def sample_clip(self, item, rng):
        return make_vidstg_input_clip(self.cfg, self.split, item, rng)

    def video_path(self, item):
        return os.path.join(self.data_dir, "videos", item["vid"] + ".mp4")


class HCSTVGDataset(GroundingDataset):
    def sample_clip(self, item, rng):
        return make_hcstvg_input_clip(self.cfg, self.split, item, rng)

    def video_path(self, item):
        return os.path.join(self.data_dir, "v1_video", item["vid"])


def build_dataset(cfg: Config, split: str, transforms=None) -> GroundingDataset:
    """ref datasets/build.py:67-82."""
    if cfg.DATASET.NAME == "VidSTG":
        return VidSTGDataset(cfg, split, transforms)
    if cfg.DATASET.NAME == "HC-STVG":
        return HCSTVGDataset(cfg, split, transforms)
    raise ValueError(f"{cfg.DATASET.NAME} is not supported")
