"""Eval-engine golden parity vs the ACTUAL reference engine code.

Together with test_eval_ref_parity.py (evaluator metrics parity) this covers
the complete reference eval chain numerically:

  model outputs -> PostProcess (box scale/clamp + triangular sted argmax)
                -> per-stream prediction dicts -> linear interpolation
                -> evaluator metrics

Here the first two conversions run through the REAL
/root/reference/models/post_processor.py and engine/evaluate.py:10-34 on
identical random inputs, against stcat_tpu's models/postprocess.py and
eval/engine.linear_interp_boxes.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

import ref_harness

ref_harness.install_stubs()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stcat_tpu.eval.engine import linear_interp_boxes  # noqa: E402
from stcat_tpu.models.postprocess import postprocess  # noqa: E402


def _load_ref_module(rel_path, name):
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


@pytest.mark.parametrize("seed,b,t", [(0, 1, 8), (1, 3, 12), (2, 2, 5)])
def test_postprocess_matches_reference(seed, b, t):
    """Our vectorized masked-argmax postprocess vs the reference's Python-loop
    PostProcess (models/post_processor.py:13-55), ragged durations included."""
    ref_pp = _load_ref_module("models/post_processor.py", "ref_post_processor")

    rng = np.random.RandomState(seed)
    durations = [int(rng.randint(2, t + 1)) for _ in range(b)]
    pred_boxes = rng.uniform(0.05, 0.95, (b, t, 4)).astype(np.float32)
    # some raw cxcywh produce x0<0 after conversion: exercises the clamp
    pred_boxes[:, :, 2:] *= 1.5
    pred_sted = rng.randn(b, t, 2).astype(np.float32) * 3
    ori_sizes = rng.randint(100, 700, (b, 2)).astype(np.int32)   # (h, w)
    frame_ids = [sorted(rng.choice(1000, size=t, replace=False).tolist())
                 for _ in range(b)]

    # reference: flattened [b*t, 4] boxes + per-frame repeated target sizes
    ref_model_out = {
        "pred_boxes": torch.tensor(pred_boxes.reshape(b * t, 4)),
        "pred_sted": torch.tensor(pred_sted),
    }
    sizes_rep = torch.tensor(
        [list(ori_sizes[i]) for i in range(b) for _ in range(t)]
    )
    ref_boxes, ref_steds = ref_pp.PostProcess()(
        ref_model_out, sizes_rep, frame_ids, durations
    )
    ref_boxes = ref_boxes.view(b, t, 4).numpy()

    frame_valid = np.zeros((b, t), bool)
    for i, d in enumerate(durations):
        frame_valid[i, :d] = True
    boxes, s_idx, e_idx = postprocess(
        jnp.asarray(pred_boxes), jnp.asarray(pred_sted),
        jnp.asarray(ori_sizes), jnp.asarray(frame_valid),
    )
    np.testing.assert_allclose(np.asarray(boxes), ref_boxes, atol=1e-4, rtol=1e-5)
    for i in range(b):
        ours_sted = [frame_ids[i][int(s_idx[i])], frame_ids[i][int(e_idx[i])] + 1]
        assert ours_sted == ref_steds[i], (i, ours_sted, ref_steds[i])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_linear_interp_matches_reference(seed):
    """Gap-filling box interpolation vs engine/evaluate.py:10-34 (the merge
    of even/odd eval streams leaves 1-frame gaps; odd T leaves a 2-gap)."""
    ref_ev = _load_ref_module("engine/evaluate.py", "ref_evaluate")

    rng = np.random.RandomState(seed)
    # typical post-merge pattern: even+odd fids with a missing tail + a hole
    fids = sorted(rng.choice(40, size=12, replace=False).tolist())
    bbox = {fid: [rng.uniform(0, 300, 4).tolist()] for fid in fids}

    import copy

    ref_out = ref_ev.linear_interp(copy.deepcopy(bbox))
    ours = linear_interp_boxes(copy.deepcopy(bbox))
    assert sorted(ref_out) == sorted(ours)
    for fid in ref_out:
        np.testing.assert_allclose(
            np.asarray(ours[fid]), np.asarray(ref_out[fid]), atol=1e-9,
            err_msg=f"frame {fid}",
        )


def test_single_item_interp_passthrough():
    d = {5: [[1.0, 2.0, 3.0, 4.0]]}
    assert linear_interp_boxes(dict(d)) == d
