"""Data-pipeline golden parity vs the ACTUAL reference code.

The clip samplers (datasets/data_utils.py make_vidstg_input_clip /
make_hcstvg_input_clip) and the full train/eval transform pipeline
(datasets/transforms.py + utils/bounding_box.py BoxList) run side by side
with stcat_tpu's data layer on identical inputs, sharing ONE RNG stream so
every stochastic decision (flip, branch select, scale choice, crop retry
loop) pairs draw-for-draw. This closes the last reference subsystem without
a direct numerical cross-check: model, criterion, optimizer, and evaluator
already have golden-parity tests; the data layer only had standalone unit
tests.

Pixels go through the reference's real tensor math (torchvision's 0.11
tensor path is re-provided by ref_harness.install_transform_stubs with
plain torch ops: bilinear interpolate, half-pixel centers, no antialias),
so this also cross-checks our numpy `bilinear_resize` against torch's
interpolation.
"""

import importlib
import os
import random as pyrandom
import sys
import types

import numpy as np
import pytest

import ref_harness

ref_harness.install_stubs()
_tv_transforms = ref_harness.install_transform_stubs()

import torch  # noqa: E402

from stcat_tpu.config import default_config, merge_from_list  # noqa: E402
from stcat_tpu.data.sampling import (  # noqa: E402
    gt_box_alignment,
    make_hcstvg_input_clip,
    make_vidstg_input_clip,
)
from stcat_tpu.data.transforms import VideoTransform  # noqa: E402


# --------------------------------------------------------------------------
# shared-RNG plumbing
# --------------------------------------------------------------------------

class FakeNpRng:
    """np.random.Generator facade over a python random.Random, so our
    sampler/transform code consumes the SAME stream as the reference's
    `random` module calls (one underlying draw per decision on each side)."""

    def __init__(self, src: pyrandom.Random):
        self._src = src

    def random(self):
        return self._src.random()

    def choice(self, seq):
        return self._src.choice(list(seq))

    def integers(self, low, high):
        # Generator.integers half-open [low, high) == randint(low, high-1)
        return self._src.randint(int(low), int(high) - 1)


def _shared_rngs(seed, *ref_modules):
    """One python Random driving the reference modules' `random` attribute,
    the torchvision-stub RandomCrop hook, and a FakeNpRng for our code."""
    src = pyrandom.Random(seed)
    for mod in ref_modules:
        mod.random = src
    _tv_transforms._rng = src
    return FakeNpRng(src)


def _load_ref_transforms():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_transforms",
        os.path.join(ref_harness.REFERENCE_ROOT, "datasets", "transforms.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_ref_data_utils():
    """datasets/data_utils.py uses a relative import (.gaussion_hm), so it
    must load as a package submodule; a synthetic package spec avoids the
    datasets/__init__.py (which drags in the full transform/build stack)."""
    if "refdatasets" not in sys.modules:
        pkg = types.ModuleType("refdatasets")
        pkg.__path__ = [os.path.join(ref_harness.REFERENCE_ROOT, "datasets")]
        pkg.__spec__ = None
        sys.modules["refdatasets"] = pkg
    return importlib.import_module("refdatasets.data_utils")


# --------------------------------------------------------------------------
# synthetic items (reference cache schema, annotations.py docstring)
# --------------------------------------------------------------------------

def _clip_item(rng, n0, span, first_fid=100, dataset="VidSTG"):
    s, e = span
    actioness = np.zeros(n0, np.float32)
    actioness[s: e + 1] = 1.0
    item = {
        "item_id": 7,
        "vid": "synthvid",
        "width": 320,
        "height": 240,
        "description": "a man walks left of the red car",
        "object": "man",
        "frame_ids": list(range(first_fid, first_fid + n0)),
        "actioness": actioness,
        "start_heatmap": rng.rand(n0).astype(np.float32),
        "end_heatmap": rng.rand(n0).astype(np.float32),
        "bboxs": rng.uniform(10, 200, size=(e - s + 1, 4)).astype(np.float32),
        "gt_temp_bound": [first_fid + s, first_fid + e],
    }
    if dataset == "VidSTG":
        item["qtype"] = "declarative"
        item["segment_bound"] = [first_fid, first_fid + n0]
    else:
        item["frame_count"] = n0 + 10
    return item


def _cfg(opts=()):
    return merge_from_list(default_config(), list(opts))


def _assert_item_equal(ref_item, our_item):
    assert list(ref_item["frame_ids"]) == list(our_item["frame_ids"])
    for key in ("actioness", "start_heatmap", "end_heatmap"):
        np.testing.assert_array_equal(
            np.asarray(ref_item[key]), np.asarray(our_item[key]), err_msg=key
        )


# --------------------------------------------------------------------------
# clip-sampler parity
# --------------------------------------------------------------------------

@pytest.mark.parametrize("split", ["train", "test"])
@pytest.mark.parametrize("seed", range(8))
def test_vidstg_clip_sampler_matches_reference(split, seed):
    """make_vidstg_input_clip: temporal-crop decision, crop start/end
    choices, and the linspace downsample all pair with the reference
    (data_utils.py:160-222) under a shared RNG stream."""
    du = _load_ref_data_utils()
    item_rng = np.random.RandomState(seed)
    n0 = int(item_rng.randint(20, 60))
    s = int(item_rng.randint(0, n0 - 8))
    e = int(item_rng.randint(s + 3, min(s + 20, n0 - 1)))
    item = _clip_item(item_rng, n0, (s, e))
    cfg = _cfg(["INPUT.TRAIN_SAMPLE_NUM", "16", "INPUT.TEMP_CROP_PROB", "0.5"])

    _shared_rngs(seed, du)
    ref_item = du.make_vidstg_input_clip(cfg, split, dict(item))
    our_item = make_vidstg_input_clip(cfg, split, dict(item), _shared_rngs(seed, du))
    _assert_item_equal(ref_item, our_item)


@pytest.mark.parametrize("split", ["train", "test"])
@pytest.mark.parametrize("seed", range(8))
def test_hcstvg_clip_sampler_matches_reference(split, seed):
    """make_hcstvg_input_clip: fps resampling (incl. the last-frame
    append) and the post-resample temporal crop pair with the reference
    (data_utils.py:81-155)."""
    du = _load_ref_data_utils()
    item_rng = np.random.RandomState(100 + seed)
    n0 = int(item_rng.randint(30, 90))
    s = int(item_rng.randint(0, n0 - 10))
    e = int(item_rng.randint(s + 4, min(s + 25, n0 - 1)))
    item = _clip_item(item_rng, n0, (s, e), dataset="HC-STVG")
    cfg = _cfg(["INPUT.SAMPLE_FPS", "3.2", "INPUT.TEMP_CROP_PROB", "0.5"])

    _shared_rngs(seed, du)
    ref_item = du.make_hcstvg_input_clip(cfg, split, dict(item))
    our_item = make_hcstvg_input_clip(cfg, split, dict(item), _shared_rngs(seed, du))
    _assert_item_equal(ref_item, our_item)


@pytest.mark.parametrize("seed", range(4))
def test_gt_box_alignment_matches_reference_getitem(seed):
    """Our gt_box_alignment == the reference __getitem__ bbox gather
    (vidstg.py:167-173: box index = frame_id - gt_temp_bound[0])."""
    du = _load_ref_data_utils()
    item_rng = np.random.RandomState(200 + seed)
    item = _clip_item(item_rng, 48, (12, 30))
    cfg = _cfg(["INPUT.TRAIN_SAMPLE_NUM", "16", "INPUT.TEMP_CROP_PROB", "1.0"])

    _shared_rngs(seed, du)
    ref_item = du.make_vidstg_input_clip(cfg, "train", dict(item))
    frame_ids = ref_item["frame_ids"]
    temp_gt = ref_item["gt_temp_bound"]
    action_idx = np.where(ref_item["actioness"])[0]
    bbox_idx = [
        frame_ids[idx] - temp_gt[0]
        for idx in range(action_idx[0], action_idx[-1] + 1)
    ]
    ref_boxes = np.asarray(ref_item["bboxs"])[bbox_idx].reshape(-1, 4)

    our_item = make_vidstg_input_clip(cfg, "train", dict(item), _shared_rngs(seed, du))
    np.testing.assert_array_equal(ref_boxes, gt_box_alignment(our_item))


# --------------------------------------------------------------------------
# transform-pipeline parity
# --------------------------------------------------------------------------

def _build_ref_train_pipeline(ref_t, resolution, flip_prob, mean, std):
    """datasets/build.py:20-52 verbatim composition."""
    scales = [resolution - 32 * i for i in range(4)]
    return ref_t.Compose([
        ref_t.RandomHorizontalFlip(flip_prob),
        ref_t.RandomSelect(
            ref_t.RandomResize(scales, max_size=720),
            ref_t.Compose([
                ref_t.RandomResize([400, 500, 600]),
                ref_t.RandomSizeCrop(384, 600),
                ref_t.RandomResize(scales, max_size=720),
            ]),
        ),
        ref_t.Normalize(mean=mean, std=std),
    ])


def _run_both_pipelines(seed, h, w, t=2, is_train=True, resolution=224):
    ref_t = _load_ref_transforms()
    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]
    flip_prob = 0.5

    data_rng = np.random.RandomState(300 + seed)
    frames = data_rng.rand(t, h, w, 3).astype(np.float32)
    # non-degenerate boxes well inside the image so crop-validity decisions
    # depend on the (identical) crop geometry, not on float ties
    n_boxes = 3
    x0 = data_rng.uniform(5, w * 0.4, n_boxes)
    y0 = data_rng.uniform(5, h * 0.4, n_boxes)
    boxes = np.stack(
        [x0, y0, x0 + data_rng.uniform(20, w * 0.5, n_boxes),
         y0 + data_rng.uniform(20, h * 0.5, n_boxes)], axis=1
    ).astype(np.float32)
    text = "the dog runs left then right of the bench"

    # reference: torch [T, C, H, W] float in [0,1] (ToTensor output,
    # vidstg.py:140-150) + BoxList(xyxy pixels, (w, h))
    _shared_rngs(seed, ref_t)
    if is_train:
        pipeline = _build_ref_train_pipeline(ref_t, resolution, flip_prob, mean, std)
    else:
        pipeline = ref_t.Compose([
            ref_t.RandomResize(resolution, max_size=720),
            ref_t.Normalize(mean=mean, std=std),
        ])
    BoxList = importlib.import_module("utils.bounding_box").BoxList
    ref_out = pipeline({
        "frames": torch.from_numpy(np.ascontiguousarray(frames.transpose(0, 3, 1, 2))),
        "boxs": BoxList(torch.from_numpy(boxes.copy()), (w, h), "xyxy"),
        "text": text,
    })
    ref_frames = ref_out["frames"].numpy().transpose(0, 2, 3, 1)
    ref_boxes = ref_out["boxs"].bbox.numpy()  # normalized cxcywh

    ours = VideoTransform(
        resolution=resolution, is_train=is_train, aug_scale=True,
        flip_prob=flip_prob, mean=np.asarray(mean, np.float32),
        std=np.asarray(std, np.float32),
    )
    our_out = ours(
        {"frames": frames.copy(), "boxes": boxes.copy(), "text": text},
        _shared_rngs(seed, ref_t),
    )
    return ref_frames, ref_boxes, ref_out["text"], our_out


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("hw", [(360, 640), (480, 640), (720, 406), (240, 320)])
def test_train_transform_pipeline_matches_reference(seed, hw):
    """Full train pipeline (hflip+text swap -> RandomSelect(multi-scale
    resize | resize+RandomSizeCrop+resize) -> Normalize) against the
    reference composition (build.py:20-52), draw-for-draw. Covers both
    RandomSelect branches and the crop retry loop across seeds."""
    h, w = hw
    ref_frames, ref_boxes, ref_text, our_out = _run_both_pipelines(seed, h, w)

    assert ref_text == our_out["text"]
    assert ref_frames.shape == our_out["frames"].shape, (
        "pixel geometry diverged: the RNG pairing is broken"
    )
    # boxes: identical float32 arithmetic on both sides
    np.testing.assert_allclose(ref_boxes, our_out["boxes_cxcywh"], atol=1e-5)
    # pixels: our numpy bilinear vs torch interpolate, up to 3 chained
    # resizes then /std (~4.5x amplification)
    np.testing.assert_allclose(ref_frames, our_out["frames"], atol=2e-3)
    assert float(np.mean(np.abs(ref_frames - our_out["frames"]))) < 2e-4


@pytest.mark.parametrize("hw", [(360, 640), (720, 406), (240, 320)])
def test_eval_transform_pipeline_matches_reference(hw):
    """Eval pipeline (shortest-side resize to RESOLUTION, max 720 ->
    Normalize), deterministic (build.py:54-63)."""
    h, w = hw
    ref_frames, ref_boxes, ref_text, our_out = _run_both_pipelines(
        0, h, w, is_train=False
    )
    assert ref_frames.shape == our_out["frames"].shape
    np.testing.assert_allclose(ref_boxes, our_out["boxes_cxcywh"], atol=1e-6)
    np.testing.assert_allclose(ref_frames, our_out["frames"], atol=1e-3)
