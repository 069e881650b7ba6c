"""Synthetic dataset: procedurally rendered clips in the real cache format.

Writes data_cache files identical in schema to the real VidSTG / HC-STVG
caches, and renders frames on the fly (a bright moving rectangle = the GT
tube on a noise background), so the ENTIRE pipeline -- cache loading, clip
sampling, transforms, batching, training, eval, vIoU metrics -- runs without
the (license-restricted) benchmark videos. Used by tests and benchmarks.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..config import Config
from .annotations import _boundary_heatmaps, _dump, cache_paths
from .datasets import GroundingDataset

_SENTENCES = [
    "an adult grabs a white cup on the table",
    "a child in red walks toward the dog outside",
    "the man in the blue shirt rides a bicycle on the left",
    "a woman places a book on the shelf near the window",
    "what does the person in black hold in the kitchen",
    "the brown dog jumps over the fence on the right",
]


def write_synthetic_cache(
    data_dir: str,
    dataset: str = "VidSTG",
    split: str = "train",
    n_items: int = 8,
    n_frames: int = 24,
    width: int = 96,
    height: int = 72,
    seed: int = 0,
    vary_geometry: bool = False,
    shared_span: bool = False,
) -> None:
    """Create input+anno caches for n_items synthetic clips.

    vary_geometry=True draws each item's (width, height, frame_count) from a
    small per-item spread (including portrait orientations) -- for tests that
    need heterogeneous item geometry (shape buckets, eval wrap-around pads,
    aspect grouping) rather than a uniform corpus.

    shared_span=True gives every item the SAME gt temporal span (drawn
    once). For overfit-capability tests this closes a from-scratch
    optimization trap: with per-item spans, the box loss (applied only on
    GT-span frames) is almost satisfiable by the time embedding alone
    ("early slots -> clip A's box, late slots -> clip B's box"), a shortcut
    a from-scratch run settles into instead of conditioning on text/pixels
    (the reference never trains from scratch -- it always starts from MDETR
    weights, docs/SURVEY.md §6). Identical spans make per-clip content the
    only signal that distinguishes the targets."""
    import zlib

    # stable across processes (python's str hash is PYTHONHASHSEED-randomized)
    rng = np.random.default_rng(seed + zlib.crc32(split.encode()) % 1000)
    base_w, base_h, base_f = width, height, n_frames
    items, annos = [], []
    fixed_span = None
    for i in range(n_items):
        if vary_geometry:
            width = int(base_w * (1 + (i % 3)))          # e.g. 96/192/288
            height = int(base_h * (1 + ((i + 1) % 2)))   # landscape+portrait mix
            n_frames = int(base_f * (1 + (i % 2)))       # two duration classes
        if shared_span and fixed_span is not None:
            tg_begin, tg_end = fixed_span
            span_len = tg_end - tg_begin + 1
        else:
            span_len = int(
                rng.integers(max(4, n_frames // 4), max(5, n_frames // 2))
            )
            # degenerate corpora (n_frames < 8): keep >= one non-GT frame
            span_len = max(1, min(span_len, n_frames - 1))
            tg_begin = int(rng.integers(0, n_frames - span_len))
            tg_end = tg_begin + span_len - 1
            if shared_span:
                fixed_span = (tg_begin, tg_end)
        frame_ids = list(range(n_frames))
        actioness = np.asarray(
            [float(tg_begin <= f <= tg_end) for f in frame_ids], np.float32
        )
        start_hm, end_hm = _boundary_heatmaps(actioness)
        # a rectangle drifting linearly
        bw, bh = rng.integers(width // 6, width // 3), rng.integers(height // 6, height // 3)
        x0 = rng.integers(0, width - bw - span_len - 1)
        y0 = rng.integers(0, height - bh - 1)
        bboxs = np.asarray(
            [[x0 + k, y0, x0 + k + bw, y0 + bh] for k in range(span_len)], np.float32
        )
        qtype = "declar" if i % 2 == 0 else "inter"
        item = {
            "item_id": i,
            "vid": f"synt_{split}_{i}",
            "frame_ids": frame_ids,
            "width": int(width),
            "height": int(height),
            "start_heatmap": start_hm.tolist(),
            "end_heatmap": end_hm.tolist(),
            "actioness": actioness.tolist(),
            "bboxs": bboxs.tolist(),
            "gt_temp_bound": [tg_begin, tg_end],
            "segment_bound": [0, n_frames - 1],
            "qtype": qtype,
            "description": _SENTENCES[i % len(_SENTENCES)],
            "object": "thing",
            "frame_count": n_frames,
        }
        anno = {
            "item_id": i,
            "vid": item["vid"],
            "bboxs": {
                str(fid): bboxs[fid - tg_begin].tolist()
                for fid in range(tg_begin, tg_end + 1)
            },
            "description": item["description"],
            "qtype": qtype,
            "gt_temp_bound": [tg_begin, tg_end],
            "frame_count": n_frames,
        }
        items.append(item)
        annos.append(anno)
    input_path, anno_path = cache_paths(data_dir, dataset, split)
    _dump(items, input_path)
    _dump(annos, anno_path)


def materialize_frame_corpus(
    data_dir: str, dataset: str = "VidSTG", split: str = "train", quality: int = 90
) -> int:
    """Encode every cached item's frames as JPEGs under data_dir/frame/<vid>/.

    This turns the synthetic cache into a corpus with a REAL image codec in
    the loop: the standard VidSTG/HCSTVG datasets then take their frame-dir
    decode branch (ref datasets/vidstg.py:143-150 load_video=False), so
    end-to-end benches measure genuine decode -> transform -> batch -> step.
    (No ffmpeg binary exists in this image, so mp4 is not an option; JPEG
    via PIL is the real codec available.) Returns the number of frames
    written; no-ops for items already materialized.
    """
    from PIL import Image

    from .annotations import _load

    input_path, _ = cache_paths(data_dir, dataset, split)
    items = _load(input_path)
    n = 0
    for item in items:
        vid_dir = os.path.join(data_dir, "frame", str(item["vid"]))
        if os.path.isdir(vid_dir):
            continue
        # render into a private staging dir, publish with an atomic rename:
        # concurrent processes (multi-host tests/launches) never observe a
        # half-written frame dir, and the loser just discards its copy
        tmp_dir = f"{vid_dir}.tmp-{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        frames = render_frames(item, range(item["frame_count"]))
        for fid in range(item["frame_count"]):
            Image.fromarray(frames[fid]).save(
                os.path.join(tmp_dir, f"img_{fid:05d}.jpg"), quality=quality
            )
            n += 1
        try:
            os.rename(tmp_dir, vid_dir)
        except OSError:  # another process published first
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
    return n


def render_frames(item: Dict, frame_ids) -> np.ndarray:
    """Deterministic noise background + white rectangle inside the GT span."""
    h, w = item["height"], item["width"]
    tg_begin, tg_end = item["gt_temp_bound"]
    bboxs = np.asarray(item["bboxs"], np.float32)
    import zlib

    out = np.empty((len(frame_ids), h, w, 3), np.uint8)
    vid_seed = zlib.crc32(str(item["vid"]).encode()) % 100000
    # smooth drifting background (video-like, JPEG-friendly: pure per-pixel
    # noise decodes ~3x slower and compresses ~10x worse than real video)
    # plus low-amplitude texture so the frames aren't degenerate
    yy = np.linspace(0, np.pi * 2, h, dtype=np.float32)[:, None]
    xx = np.linspace(0, np.pi * 2, w, dtype=np.float32)[None, :]
    r0 = np.random.default_rng(vid_seed)
    phase = r0.uniform(0, np.pi * 2, size=3).astype(np.float32)
    texture = r0.integers(0, 16, size=(h, w, 3), dtype=np.uint8)
    for k, fid in enumerate(frame_ids):
        drift = 0.1 * fid
        img = np.empty((h, w, 3), np.uint8)
        for c in range(3):
            img[:, :, c] = (
                40 + 35 * (np.sin(yy + phase[c] + drift) * np.cos(xx - drift) + 1)
            ).astype(np.uint8)
        img += texture
        if tg_begin <= fid <= tg_end:
            x0, y0, x1, y1 = bboxs[fid - tg_begin].astype(int)
            img[y0:y1, x0:x1] = 220
        out[k] = img
    return out


class SyntheticDataset(GroundingDataset):
    """Reads the synthetic cache. Frames come from the materialized JPEG
    corpus when present (the REAL decode chain: native libjpeg -> raw loader,
    same branch the benchmarks run) and fall back to on-the-fly rendering
    otherwise (hermetic unit tests with no files).

    Clip sampling routes by DATASET.NAME (the cache schema is shared), so
    the synthetic twin can stand in for either dataset family end-to-end:
    VidSTG's segment downsampling or HC-STVG's fps resampling
    (ref data_utils.py:81-155 vs :158-213)."""

    def sample_clip(self, item, rng):
        if self.cfg.DATASET.NAME == "HC-STVG":
            from .sampling import make_hcstvg_input_clip

            return make_hcstvg_input_clip(self.cfg, self.split, item, rng)
        from .sampling import make_vidstg_input_clip

        return make_vidstg_input_clip(self.cfg, self.split, item, rng)

    def _materialized(self, item) -> bool:
        return os.path.isdir(
            os.path.join(self.data_dir, "frame", str(item["vid"]))
        )

    def load_frames(self, item):
        if self._materialized(item):
            return super().load_frames(item)
        return render_frames(item, item["frame_ids"])

    def load_frames_yuv(self, item):
        if self._materialized(item):
            return super().load_frames_yuv(item)
        from .decode import rgb_to_yuv420

        return rgb_to_yuv420(render_frames(item, item["frame_ids"]))


def make_synthetic_dataset(
    cfg: Config, split: str, n_items: int = 8, n_frames: int = 24,
    transforms=None, vary_geometry: bool = False, shared_span: bool = False,
) -> SyntheticDataset:
    input_path, _ = cache_paths(cfg.DATA_DIR, cfg.DATASET.NAME, split)
    if not os.path.exists(input_path):
        write_synthetic_cache(
            cfg.DATA_DIR, cfg.DATASET.NAME, split, n_items=n_items,
            n_frames=n_frames, vary_geometry=vary_geometry,
            shared_span=shared_span,
        )
    # JPEG corpus (no-op when already on disk): the CLI's synthetic runs
    # exercise the production decode path instead of per-sample rendering
    materialize_frame_corpus(cfg.DATA_DIR, cfg.DATASET.NAME, split)
    return SyntheticDataset(cfg, split, transforms)
