"""Criterion-only parity vs the ACTUAL reference VideoSTGLoss (torch) on
synthetic outputs, including a B=2 batch.

Complements test_grad_parity.py (full model, B=1): here the reference
criterion (models/criterion.py:11-208) and our `video_stg_loss` consume the
SAME synthetic predictions, so any disagreement is criterion math, not model
numerics.

Scope note on B>1: the reference trains 1 clip/GPU with DDP averaging
(scripts/train_net.py:282-284), so its per-batch `.mean()` over the padded
[B, T_max] grid only ever sees equal durations. Our global-batch form uses
each clip's own duration (train/criterion.py docstring) -- the faithful
DDP-equivalent. The two agree whenever durations are equal (incl. the
published recipe); the unequal-duration case is intentionally NOT asserted
equal here because the reference's single-process B>1 semantics (mean over
padded frames) is a configuration it never trains.
"""

import sys

import numpy as np
import pytest

import ref_harness

ref_harness.install_stubs()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stcat_tpu.core.batch import VideoTargets  # noqa: E402
from stcat_tpu.train.criterion import build_weight_dict, video_stg_loss  # noqa: E402
from stcat_tpu.config import default_config, merge_from_list  # noqa: E402


class _Boxes:
    def __init__(self, bbox):
        self.bbox = bbox

    def __len__(self):
        return len(self.bbox)


def _make_case(b, t, spans, seed=0):
    """Random outputs + consistent targets for b clips of t frames each."""
    rng = np.random.RandomState(seed)
    n_aux = 1
    boxes = rng.uniform(0.2, 0.7, (b, t, 4)).astype(np.float32)
    outputs = {
        "pred_boxes": rng.uniform(0.1, 0.9, (b, t, 4)).astype(np.float32),
        "pred_sted": rng.randn(b, t, 2).astype(np.float32),
        "pred_actioness": rng.randn(b, t, 1).astype(np.float32),
        "weights": rng.uniform(0.05, 0.95, (b, t, t)).astype(np.float32),
    }
    outputs["aux_outputs"] = [
        {
            "pred_boxes": rng.uniform(0.1, 0.9, (b, t, 4)).astype(np.float32),
            "pred_sted": rng.randn(b, t, 2).astype(np.float32),
            "pred_actioness": rng.randn(b, t, 1).astype(np.float32),
            "weights": rng.uniform(0.05, 0.95, (b, t, t)).astype(np.float32),
        }
        for _ in range(n_aux)
    ]
    actioness = np.zeros((b, t), np.float32)
    for i, (s0, s1) in enumerate(spans):
        actioness[i, s0: s1 + 1] = 1.0
    return outputs, boxes, actioness


def _ref_losses(outputs, boxes, actioness, durations):
    from models.criterion import VideoSTGLoss

    b, t = actioness.shape
    cfg = default_config()
    ref_cfg = ref_harness.RefCfg(SOLVER=ref_harness.RefCfg(
        EOS_COEF=cfg.SOLVER.EOS_COEF, SIGMA=cfg.SOLVER.SIGMA))
    crit = VideoSTGLoss(ref_cfg, ["boxes", "sted", "guided_attn", "actioness"])

    def conv(o):
        d = {
            # reference pred_boxes is the flat [B*T, 4] layout the decoder
            # emits (pipeline.py:96); the criterion slices GT-span rows
            "pred_boxes": torch.tensor(o["pred_boxes"].reshape(b * t, 4)),
            "pred_sted": torch.tensor(o["pred_sted"]),
            "pred_actioness": torch.tensor(o["pred_actioness"]),
            "weights": torch.tensor(o["weights"]),
        }
        return d

    t_out = conv(outputs)
    t_out["aux_outputs"] = [conv(a) for a in outputs["aux_outputs"]]
    targets = []
    for i in range(b):
        span = np.where(actioness[i] > 0)[0]
        targets.append({
            "actioness": torch.tensor(actioness[i]),
            "boxs": _Boxes(torch.tensor(boxes[i, span[0]: span[-1] + 1])),
        })
    losses = crit(t_out, targets, durations=list(durations))
    return {k: float(v) for k, v in losses.items()}


def _our_losses(outputs, boxes, actioness, durations):
    b, t = actioness.shape
    cfg = default_config()
    frame_valid = np.zeros((b, t), bool)
    for i, d in enumerate(durations):
        frame_valid[i, :d] = True
    box_valid = actioness.astype(bool)
    spans = [(int(np.where(a > 0)[0][0]), int(np.where(a > 0)[0][-1]))
             for a in actioness]
    targets = VideoTargets(
        boxes=jnp.asarray(boxes * box_valid[..., None]),
        box_valid=jnp.asarray(box_valid),
        actioness=jnp.asarray(actioness),
        temp_bound=jnp.asarray(spans, jnp.int32),
    )
    num_boxes = max(box_valid.sum() / b, 1.0)
    out = {
        k: jnp.asarray(v) if not isinstance(v, list) else
        [{kk: jnp.asarray(vv) for kk, vv in a.items()} for a in v]
        for k, v in outputs.items()
    }
    losses = video_stg_loss(
        out, targets, jnp.asarray(frame_valid), num_boxes,
        sigma=cfg.SOLVER.SIGMA, eos_coef=cfg.SOLVER.EOS_COEF,
        use_attn=True, use_actioness=True,
    )
    return {k: float(v) for k, v in losses.items()}


@pytest.mark.parametrize("b,spans", [
    (1, [(2, 6)]),
    (2, [(1, 4), (3, 8)]),
    (3, [(0, 0), (2, 9), (5, 5)]),
])
def test_criterion_matches_reference_equal_durations(b, spans):
    t = 10
    outputs, boxes, actioness = _make_case(b, t, spans, seed=b)
    ref = _ref_losses(outputs, boxes, actioness, durations=[t] * b)
    ours = _our_losses(outputs, boxes, actioness, durations=[t] * b)
    assert set(ref) == set(ours)
    for k in sorted(ref):
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


def test_criterion_b1_padded_matches_reference():
    """B=1 with padding: ref sees duration=t (its collate never pads B=1
    beyond the clip), ours sees the same clip inside a padded T -- the
    masked form must reproduce the unpadded reference values exactly."""
    t, pad_t = 8, 12
    outputs, boxes, actioness = _make_case(1, t, [(2, 5)], seed=11)
    ref = _ref_losses(outputs, boxes, actioness, durations=[t])

    pad = lambda a: np.pad(a, [(0, 0), (0, pad_t - t)] +
                           [(0, 0)] * (a.ndim - 2))

    def pad_w(w):  # [B, T, T] -> [B, pad_t, pad_t]
        out = np.zeros((1, pad_t, pad_t), w.dtype)
        out[:, :t, :t] = w
        return out

    def pad_out(o):
        return {k: (pad_w(v) if k == "weights" else pad(v))
                for k, v in o.items() if k != "aux_outputs"}

    p_out = pad_out(outputs)
    p_out["aux_outputs"] = [pad_out(a) for a in outputs["aux_outputs"]]
    ours = _our_losses(p_out, pad(boxes), pad(actioness), durations=[t])
    for k in sorted(ref):
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


@pytest.mark.parametrize("b,t,pad_t,spans,seed", [
    (1, 4, 64, [(1, 2)], 21),            # extreme padding: 4 real of 64
    (2, 6, 48, [(0, 3), (2, 5)], 22),    # B>1, heavy padding, equal durations
])
def test_criterion_extreme_padding_with_stray_attn_mass(b, t, pad_t, spans, seed):
    """Guided-attn deviation proof (round-2 review weak item 5): our criterion
    masks padded COLUMNS of the temporal self-attn weights
    (train/criterion.py `col_valid`) where the reference has no padded columns
    at all (models/criterion.py:119-124 sees each rank's unpadded view). The
    two are claimed equivalent because masked attention puts ~0 mass there;
    this test proves the stronger property: even with LARGE stray mass on
    padded columns (0.9, where -log(1-w) explodes), the masked form still
    reproduces the reference's unpadded values exactly -- the equivalence is
    structural, not a numerics accident."""
    outputs, boxes, actioness = _make_case(b, t, spans, seed=seed)
    ref = _ref_losses(outputs, boxes, actioness, durations=[t] * b)

    pad = lambda a: np.pad(a, [(0, 0), (0, pad_t - t)] +
                           [(0, 0)] * (a.ndim - 2))

    def pad_w(w):  # [B, T, T] -> [B, pad_t, pad_t], stray mass on padding
        rng = np.random.RandomState(seed + 100)
        out = rng.uniform(0.5, 0.9, (b, pad_t, pad_t)).astype(w.dtype)
        out[:, :t, :t] = w
        return out

    def pad_out(o):
        return {k: (pad_w(v) if k == "weights" else pad(v))
                for k, v in o.items() if k != "aux_outputs"}

    p_out = pad_out(outputs)
    p_out["aux_outputs"] = [pad_out(a) for a in outputs["aux_outputs"]]
    ours = _our_losses(p_out, pad(boxes), pad(actioness), durations=[t] * b)
    for k in sorted(ref):
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
