"""Evaluator golden parity vs the ACTUAL reference evaluator stacks.

Identical synthetic predictions + GT go through

  /root/reference/datasets/evaluation/vidstg_eval.py  VidSTGEvaluator
  /root/reference/datasets/evaluation/hcstvg_eval.py  HCSTVGEvaluator

and through stcat_tpu's GroundingEvaluator; every summary metric
(m_tIoU/m_vIoU/vIoU@R/gt_vIoU[@R], per qtype for VidSTG) must agree to 1e-9.
This closes the last reference subsystem without a direct numerical
cross-check (the criterion already has test_criterion_ref_parity.py).
"""

import importlib.util
import logging
import os
import sys

import numpy as np
import pytest

import ref_harness

ref_harness.install_stubs()


def _load_ref_module(rel_path, name):
    """Import a reference module by file path, bypassing the datasets
    package __init__ (it drags in torchvision.transforms)."""
    sys.path.insert(0, ref_harness.REFERENCE_ROOT)
    try:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(ref_harness.REFERENCE_ROOT, rel_path)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(ref_harness.REFERENCE_ROOT)

import torch  # noqa: E402

from stcat_tpu.config import default_config, merge_from_list  # noqa: E402
from stcat_tpu.data.annotations import _dump, cache_paths  # noqa: E402
from stcat_tpu.eval import build_evaluator  # noqa: E402


def _synth_case(n_items, seed, with_qtype):
    """(annos, predictions, video_predictions) with int frame ids."""
    rng = np.random.RandomState(seed)
    annos, preds, vpreds = [], {}, {}
    for i in range(n_items):
        frame_count = int(rng.randint(12, 30))
        s = int(rng.randint(0, frame_count - 6))
        e = int(rng.randint(s + 2, min(s + 12, frame_count - 1)))
        bboxs = {
            fid: (rng.uniform(0, 100, 4) + np.asarray([0, 0, 30, 30])).tolist()
            for fid in range(s, e + 1)
        }
        annos.append(
            {
                "item_id": i,
                "vid": f"v{i}",
                "description": f"sentence {i}",
                "gt_temp_bound": [s, e],
                "bboxs": bboxs,
                "qtype": ("declar" if i % 2 == 0 else "inter"),
                "frame_count": frame_count,
            }
        )
        preds[i] = {
            fid: [(rng.uniform(0, 100, 4) + np.asarray([0, 0, 40, 40])).tolist()]
            for fid in range(frame_count)
        }
        ps = int(rng.randint(0, frame_count - 2))
        pe = int(rng.randint(ps + 1, frame_count))
        vpreds[i] = {"sted": [ps, pe]}
        if with_qtype:
            vpreds[i]["qtype"] = annos[-1]["qtype"]
        else:
            vpreds[i]["qtype"] = "none"
    return annos, preds, vpreds


def _write_caches(tmp_path, dataset, annos):
    """Our json.gz anno cache + the reference's torch .cache file."""
    data_dir = str(tmp_path)
    input_path, anno_path = cache_paths(data_dir, dataset, "test")
    _dump([], input_path)  # evaluator only reads the anno cache
    _dump(annos, anno_path)
    # reference cache name: vidstd-test-anno.cache / hcstvg-test-anno.cache
    stem = "vidstd" if dataset == "VidSTG" else "hcstvg"
    ref_cache = os.path.join(data_dir, "data_cache", f"{stem}-test-anno.cache")
    torch.save(annos, ref_cache)
    return data_dir


@pytest.mark.parametrize("seed", [0, 3])
def test_vidstg_evaluator_matches_reference(tmp_path, seed):
    VidSTGEvaluator = _load_ref_module(
        "datasets/evaluation/vidstg_eval.py", "ref_vidstg_eval"
    ).VidSTGEvaluator

    annos, preds, vpreds = _synth_case(12, seed, with_qtype=True)
    data_dir = _write_caches(tmp_path, "VidSTG", annos)

    ref_ev = VidSTGEvaluator(
        logging.getLogger("ref"), data_dir, "test", iou_thresholds=[0.3, 0.5],
        save_pred=False,
    )
    ref_ev.update(preds)
    ref_ev.video_update(vpreds)
    ref_out = ref_ev.summarize()

    cfg = merge_from_list(
        default_config(), ["DATA_DIR", data_dir, "DATASET.NAME", "VidSTG"]
    )
    ours = build_evaluator(cfg, None, "test")
    ours.save_pred = False
    ours.update(preds)
    ours.video_update(vpreds)
    our_out = ours.summarize()

    assert set(ref_out) == set(our_out), (
        sorted(set(ref_out) ^ set(our_out))
    )
    for k, v in ref_out.items():
        assert abs(our_out[k] - v) < 1e-9, (k, our_out[k], v)


@pytest.mark.parametrize("seed", [1])
def test_hcstvg_evaluator_matches_reference(tmp_path, seed):
    HCSTVGEvaluator = _load_ref_module(
        "datasets/evaluation/hcstvg_eval.py", "ref_hcstvg_eval"
    ).HCSTVGEvaluator

    annos, preds, vpreds = _synth_case(10, seed, with_qtype=False)
    data_dir = _write_caches(tmp_path, "HC-STVG", annos)

    ref_ev = HCSTVGEvaluator(
        logging.getLogger("ref"), data_dir, "test", iou_thresholds=[0.3, 0.5],
        save_pred=False,
    )
    ref_ev.update(preds)
    ref_ev.video_update(vpreds)
    ref_out = ref_ev.summarize()

    cfg = merge_from_list(
        default_config(), ["DATA_DIR", data_dir, "DATASET.NAME", "HC-STVG"]
    )
    ours = build_evaluator(cfg, None, "test")
    ours.save_pred = False
    ours.update(preds)
    ours.video_update(vpreds)
    our_out = ours.summarize()

    for k, v in ref_out.items():
        assert k in our_out, (k, sorted(our_out))
        assert abs(our_out[k] - v) < 1e-9, (k, our_out[k], v)
