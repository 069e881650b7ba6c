"""Criterion tests: known values, mask correctness, aux replication."""

import jax.numpy as jnp
import numpy as np

from stcat_tpu.train.criterion import build_weight_dict, video_stg_loss
from helpers import make_batch_and_targets, tiny_cfg


def perfect_outputs(targets, t, use_aux=False):
    """Outputs that exactly match the targets."""
    b = targets.boxes.shape[0]
    sted = np.full((b, t, 2), -10.0, np.float32)
    for i in range(b):
        sted[i, int(targets.temp_bound[i, 0]), 0] = 10.0
        sted[i, int(targets.temp_bound[i, 1]), 1] = 10.0
    out = {
        "pred_boxes": targets.boxes,
        "pred_sted": jnp.asarray(sted),
        "pred_actioness": (targets.actioness * 20 - 10)[..., None],
        "weights": jnp.ones((b, t, t)) / t,
    }
    if use_aux:
        out["aux_outputs"] = [dict(out)]
    return out


def test_perfect_boxes_zero_loss():
    batch, targets = make_batch_and_targets(t=8)
    out = perfect_outputs(targets, 8)
    losses = video_stg_loss(out, targets, batch.frame_valid, num_boxes=jnp.asarray(4.0))
    assert float(losses["loss_bbox"]) < 1e-6
    assert float(losses["loss_giou"]) < 1e-5
    assert float(losses["loss_actioness"]) < 1e-3


def test_box_loss_known_value():
    batch, targets = make_batch_and_targets(t=8, span=(2, 5))
    out = perfect_outputs(targets, 8)
    # shift all predicted boxes by +0.1 in cx: L1 per valid frame = 0.1
    shifted = np.asarray(targets.boxes).copy()
    shifted[..., 0] += 0.1
    out["pred_boxes"] = jnp.asarray(shifted)
    num_boxes = float(np.asarray(targets.box_valid).sum())  # 4 frames in span
    losses = video_stg_loss(out, targets, batch.frame_valid, jnp.asarray(num_boxes))
    np.testing.assert_allclose(float(losses["loss_bbox"]), 0.1 * num_boxes / num_boxes, atol=1e-5)


def test_padded_frames_do_not_contribute():
    batch, targets = make_batch_and_targets(t=8, dur=7)
    out = perfect_outputs(targets, 8)
    # poison predictions at the padded frame
    boxes = np.asarray(out["pred_boxes"]).copy()
    boxes[:, 7] = 0.9
    act = np.asarray(out["pred_actioness"]).copy()
    act[:, 7] = 5.0
    out["pred_boxes"] = jnp.asarray(boxes)
    out["pred_actioness"] = jnp.asarray(act)
    losses = video_stg_loss(out, targets, batch.frame_valid, jnp.asarray(4.0))
    assert float(losses["loss_bbox"]) < 1e-6
    assert float(losses["loss_actioness"]) < 1e-3


def test_guided_attn_prefers_low_weight_on_negative_rows():
    batch, targets = make_batch_and_targets(t=8, dur=8, span=(2, 5))
    out = perfect_outputs(targets, 8)
    l_uniform = video_stg_loss(out, targets, batch.frame_valid, jnp.asarray(4.0))
    w = np.ones((1, 8, 8), np.float32) * 1e-4
    w[:, :, 3] = 1.0  # concentrated -> high -log(1-w) on negative rows
    out["weights"] = jnp.asarray(w)
    l_conc = video_stg_loss(out, targets, batch.frame_valid, jnp.asarray(4.0))
    assert float(l_conc["loss_guided_attn"]) > float(l_uniform["loss_guided_attn"])


def test_sted_loss_decreases_with_correct_peak():
    batch, targets = make_batch_and_targets(t=8, span=(2, 5))
    good = perfect_outputs(targets, 8)
    bad = perfect_outputs(targets, 8)
    sted = np.full((1, 8, 2), -10.0, np.float32)
    sted[0, 6, 0] = 10.0  # wrong start peak
    sted[0, 0, 1] = 10.0  # wrong end peak
    bad["pred_sted"] = jnp.asarray(sted)
    lg = video_stg_loss(good, targets, batch.frame_valid, jnp.asarray(4.0))
    lb = video_stg_loss(bad, targets, batch.frame_valid, jnp.asarray(4.0))
    assert float(lb["loss_sted"]) > float(lg["loss_sted"])


def test_aux_losses_replicated():
    batch, targets = make_batch_and_targets(t=8)
    out = perfect_outputs(targets, 8, use_aux=True)
    losses = video_stg_loss(out, targets, batch.frame_valid, jnp.asarray(4.0))
    for k in ("loss_bbox", "loss_giou", "loss_sted", "loss_actioness", "loss_guided_attn"):
        assert k in losses and f"{k}_0" in losses
        np.testing.assert_allclose(float(losses[k]), float(losses[f"{k}_0"]), rtol=1e-6)


def test_weight_dict_matches_reference_shape():
    cfg = tiny_cfg()
    wd = build_weight_dict(cfg)
    # 5 base losses + (DEC_LAYERS-1) aux replicas
    assert wd["loss_bbox"] == cfg.SOLVER.BBOX_COEF
    assert wd["loss_guided_attn"] == cfg.SOLVER.ATTN_COEF
    assert "loss_bbox_0" in wd and "loss_bbox_1" not in wd  # DEC_LAYERS=2
