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


class TestDDPEquivalenceB3:
    """Global-batch B=3 loss == mean of per-rank reference losses.

    The reference only ever runs B=1 per DDP rank (datasets/build.py:151
    asserts it); its global objective is the DDP mean over ranks of each
    rank's loss computed at that clip's own UNPADDED duration, with
    num_boxes = clamp(total_boxes / world_size, 1) after all_reduce
    (ref models/criterion.py:173-178). This transcribes that per-rank math
    in numpy (ref criterion.py:26-130) for 3 clips of different durations
    and checks our padded fixed-shape batch form reproduces the mean.
    """

    def _make(self, t=10):
        rng = np.random.RandomState(3)
        durs = [10, 7, 5]
        spans = [(2, 6), (1, 3), (0, 4)]
        b = len(durs)
        frame_valid = np.zeros((b, t), bool)
        actioness = np.zeros((b, t), np.float32)
        boxes = rng.uniform(0.2, 0.6, (b, t, 4)).astype(np.float32)
        pred_boxes = rng.uniform(0.2, 0.6, (b, t, 4)).astype(np.float32)
        pred_sted = rng.randn(b, t, 2).astype(np.float32)
        pred_act = rng.randn(b, t, 1).astype(np.float32)
        weights = rng.uniform(0.01, 0.2, (b, t, t)).astype(np.float32)
        for i, (d, sp) in enumerate(zip(durs, spans)):
            frame_valid[i, :d] = True
            actioness[i, sp[0]: sp[1] + 1] = 1.0
        box_valid = actioness.astype(bool)
        from stcat_tpu.core.batch import VideoTargets

        targets = VideoTargets(
            boxes=jnp.asarray(boxes * box_valid[..., None]),
            box_valid=jnp.asarray(box_valid),
            actioness=jnp.asarray(actioness),
            temp_bound=jnp.asarray(np.asarray(spans, np.int32)),
        )
        out = {
            "pred_boxes": jnp.asarray(pred_boxes),
            "pred_sted": jnp.asarray(pred_sted),
            "pred_actioness": jnp.asarray(pred_act),
            "weights": jnp.asarray(weights),
        }
        return out, targets, frame_valid, durs, spans, boxes, pred_boxes, pred_sted, pred_act, weights

    @staticmethod
    def _ref_rank_losses(dur, span, gt_boxes, pred_boxes, pred_sted, pred_act,
                         weights, num_boxes, sigma, eos_coef):
        """Per-rank reference loss at B=1, unpadded T=dur (numpy transcription)."""
        eps = 1e-6
        s, e = span
        # loss_boxes: slice in-span frames (criterion.py:26-44,160-171)
        l1 = np.abs(pred_boxes[s:e + 1] - gt_boxes[s:e + 1]).sum()
        import torch
        from stcat_tpu.ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou_pairwise

        giou = np.asarray(generalized_box_iou_pairwise(
            box_cxcywh_to_xyxy(jnp.asarray(pred_boxes[s:e + 1])),
            box_cxcywh_to_xyxy(jnp.asarray(gt_boxes[s:e + 1])),
        ))
        loss_bbox = l1 / max(num_boxes, 1)
        loss_giou = (1.0 - giou).sum() / max(num_boxes, 1)

        # loss_sted (criterion.py:64-109): unpadded -> full-axis normalize
        def softmax(x):
            x = x - x.max()
            ex = np.exp(x)
            return ex / ex.sum()

        def kl_term(logits, center):
            pos = np.arange(dur, dtype=np.float32)
            target = np.exp(-((pos - center) ** 2) / (2 * sigma ** 2)) + eps
            target = target / target.sum()
            pred = softmax(logits)
            return (pred * np.log((pred + eps) / target)).sum()

        loss_sted = (kl_term(pred_sted[:dur, 0], s) + kl_term(pred_sted[:dur, 1], e)) / dur

        # loss_guided_attn (criterion.py:111-130)
        positive = np.zeros(dur, bool)
        positive[s:e + 1] = True
        negative = ~positive
        la = -np.log(1 - weights[:dur, :dur] + eps)
        la[positive] = 0.0
        nb_neg = negative.sum() + eps
        loss_attn = (la.sum(1) / nb_neg).sum()

        # loss_actioness (criterion.py:46-62)
        logits = pred_act[:dur, 0]
        labels = (positive).astype(np.float32)
        w = np.full(dur, eos_coef, np.float32)
        w[s:e + 1] = 1.0
        bce = np.maximum(logits, 0) - logits * labels + np.log1p(np.exp(-np.abs(logits)))
        loss_act = (bce * w).mean()
        return dict(loss_bbox=loss_bbox, loss_giou=loss_giou, loss_sted=loss_sted,
                    loss_guided_attn=loss_attn, loss_actioness=loss_act)

    def test_b3_matches_ddp_mean_of_ranks(self):
        sigma, eos_coef = 2.0, 0.1
        (out, targets, frame_valid, durs, spans, boxes, pred_boxes,
         pred_sted, pred_act, weights) = self._make()
        total_boxes = sum(e - s + 1 for s, e in spans)
        num_boxes = max(total_boxes / len(durs), 1.0)

        ours = video_stg_loss(out, targets, jnp.asarray(frame_valid),
                              jnp.asarray(num_boxes), sigma=sigma, eos_coef=eos_coef)
        per_rank = [
            self._ref_rank_losses(durs[i], spans[i], boxes[i], np.asarray(out["pred_boxes"])[i],
                                  pred_sted[i], pred_act[i], weights[i],
                                  num_boxes, sigma, eos_coef)
            for i in range(3)
        ]
        for k in ("loss_bbox", "loss_giou", "loss_sted", "loss_guided_attn", "loss_actioness"):
            ref = np.mean([r[k] for r in per_rank])
            np.testing.assert_allclose(float(ours[k]), ref, rtol=2e-5,
                                       err_msg=k)
