"""Training-objective golden parity: loss dict AND parameter gradients vs
the PyTorch reference.

Round-1 parity covered the forward only; the training risk left was the
objective (criterion + aux replicas + weighting) and its backward. Here the
ACTUAL reference criterion (models/criterion.py:11-208) runs on the ACTUAL
reference model's outputs, our `video_stg_loss` runs on our converted
model's outputs, and we assert:

  1. every weighted loss term matches (loss_bbox/giou/sted/guided_attn/
     actioness plus all aux replicas),
  2. d(total)/d(params) matches leaf-by-leaf. The torch grads are mapped
     into our param-tree layout by running the grad state_dict through
     convert_reference_stcat -- valid because the converter applies only
     linear layout ops (transpose/reshape/split) to trainable params; a
     0/1 state_dict run through the same converter marks which leaves were
     trainable on the reference side (frozen stem/layer1 have no grads).
"""

import sys
from collections import OrderedDict

import numpy as np
import pytest

import ref_harness

ref_harness.install_stubs()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stcat_tpu.core.batch import VideoBatch, VideoTargets  # noqa: E402
from stcat_tpu.models import STCATNet  # noqa: E402
from stcat_tpu.train.convert_reference import convert_reference_stcat  # noqa: E402
from stcat_tpu.train.criterion import build_weight_dict, video_stg_loss  # noqa: E402

from test_full_parity import T, H, W, L, VOCAB, _hf_config, _our_cfg  # noqa: E402

SPAN = (1, 4)  # GT temporal boundary (inclusive), inside duration T


class _Boxes:
    """Minimal stand-in for the reference BoxList ('boxs' target field)."""

    def __init__(self, bbox):
        self.bbox = bbox

    def __len__(self):
        return len(self.bbox)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(7)
    frames = rng.randn(T, 3, H, W).astype(np.float32) * 0.4
    ids = rng.randint(3, VOCAB, size=(1, L)).astype(np.int64)
    boxes = np.zeros((T, 4), np.float32)
    n = SPAN[1] - SPAN[0] + 1
    boxes[SPAN[0]: SPAN[1] + 1, :2] = rng.uniform(0.35, 0.6, (n, 2))
    boxes[SPAN[0]: SPAN[1] + 1, 2:] = rng.uniform(0.15, 0.3, (n, 2))
    return frames, ids, boxes


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_loss_and_grad_parity(monkeypatch, inputs):
    frames, ids, boxes = inputs
    tokenizer = ref_harness.FakeTokenizer(ids, np.ones_like(ids))
    ref_harness.patch_text_encoder(monkeypatch, _hf_config(), tokenizer)

    from models.pipeline import STCATNet as RefSTCATNet
    from models.criterion import VideoSTGLoss
    from utils.misc import NestedTensor

    torch.manual_seed(0)
    ref_cfg = ref_harness.make_ref_cfg(from_scratch=True)
    cfg = _our_cfg(True)
    s = cfg.SOLVER
    for k in ("BBOX_COEF", "GIOU_COEF", "TEMP_COEF", "ATTN_COEF",
              "ACTIONESS_COEF", "SIGMA", "EOS_COEF"):
        setattr(ref_cfg.SOLVER, k, getattr(s, k))

    ref_model = RefSTCATNet(ref_cfg).eval()
    ref_harness.randomize_frozen_bn(ref_model)

    videos = NestedTensor(
        torch.tensor(frames), torch.zeros((T, H, W), dtype=torch.bool), [T]
    )
    ref_out = ref_model(videos, ["a grad parity clip"])

    actioness = np.zeros((T,), np.float32)
    actioness[SPAN[0]: SPAN[1] + 1] = 1.0
    ref_targets = [{
        "actioness": torch.tensor(actioness),
        "boxs": _Boxes(torch.tensor(boxes[SPAN[0]: SPAN[1] + 1])),
    }]
    criterion = VideoSTGLoss(
        ref_cfg, losses=["boxes", "sted", "guided_attn", "actioness"]
    )
    ref_losses = criterion(ref_out, ref_targets, durations=[T])

    wd = build_weight_dict(cfg)
    assert set(wd) == set(ref_losses), (
        sorted(set(wd) ^ set(ref_losses)))
    ref_total = sum(ref_losses[k] * wd[k] for k in wd)
    ref_total.backward()

    # ---- our side: converted params, same batch/targets ----
    params, constants, unused = convert_reference_stcat(
        ref_model.state_dict(), cfg
    )
    assert not unused
    model = STCATNet(cfg)
    batch = VideoBatch(
        frames=jnp.asarray(frames.transpose(0, 2, 3, 1)[None]),
        frame_valid=jnp.ones((1, T), bool),
        pixel_valid=jnp.ones((1, T, H, W), bool),
        token_ids=jnp.asarray(ids, jnp.int32),
        token_valid=jnp.ones((1, L), bool),
    )
    box_valid = actioness.astype(bool)
    targets = VideoTargets(
        boxes=jnp.asarray(boxes[None] * box_valid[None, :, None]),
        box_valid=jnp.asarray(box_valid[None]),
        actioness=jnp.asarray(actioness[None]),
        temp_bound=jnp.asarray([[SPAN[0], SPAN[1]]], jnp.int32),
    )
    num_boxes = float(max(box_valid.sum(), 1))

    def total_loss(p):
        out = model.apply(
            {"params": p, "constants": constants}, batch, deterministic=True
        )
        losses = video_stg_loss(
            out, targets, batch.frame_valid, num_boxes,
            sigma=s.SIGMA, eos_coef=s.EOS_COEF,
            use_attn=True, use_actioness=True,
        )
        return sum(losses[k] * wd[k] for k in wd), losses

    (our_total, our_losses), our_grads = jax.value_and_grad(
        total_loss, has_aux=True
    )(params)

    for k in sorted(wd):
        np.testing.assert_allclose(
            float(our_losses[k]), float(ref_losses[k].detach()),
            atol=2e-4, rtol=1e-3, err_msg=k,
        )
    np.testing.assert_allclose(
        float(our_total), float(ref_total.detach()), atol=5e-4, rtol=1e-3
    )

    # ---- gradient parity: map torch grads into our tree layout ----
    named = dict(ref_model.named_parameters())
    grad_sd, mask_sd = OrderedDict(), OrderedDict()
    for k, v in ref_model.state_dict().items():
        p = named.get(k)
        if p is not None and p.grad is not None:
            grad_sd[k] = p.grad.detach().clone()
            mask_sd[k] = torch.ones_like(v)
        else:
            grad_sd[k] = torch.zeros_like(v)
            mask_sd[k] = torch.zeros_like(v)
    ref_grads, _, _ = convert_reference_stcat(grad_sd, cfg)
    grad_mask, _, _ = convert_reference_stcat(mask_sd, cfg)

    flat_ours = jax.tree_util.tree_flatten_with_path(our_grads)[0]
    flat_ref = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    )
    flat_mask = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_flatten_with_path(grad_mask)[0]
    )
    compared = 0
    for path, ours in flat_ours:
        key = jax.tree_util.keystr(path)
        mask = np.asarray(flat_mask[key]) > 0.5
        if not mask.any():
            continue  # frozen on the reference side (stem/layer1)
        ref_g = np.asarray(flat_ref[key])[mask]
        our_g = np.asarray(ours)[mask]
        ref_norm = np.linalg.norm(ref_g)
        if ref_norm < 1e-4:
            # mathematically-zero gradient (e.g. key-bias directions, to
            # which softmax is invariant): both sides must be ~zero; the
            # residuals are rounding noise with arbitrary relative error
            assert np.linalg.norm(our_g) < 1e-3, key
        else:
            rel = np.linalg.norm(our_g - ref_g) / ref_norm
            assert rel < 2e-2, f"{key}: relative grad error {rel:.3g}"
        compared += 1
    assert compared > 100, f"only {compared} leaves compared"
