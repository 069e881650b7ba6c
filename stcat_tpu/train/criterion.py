"""VideoSTG loss as a pure jittable function over fixed-shape masked batches.

Reference: models/criterion.py:11-208. There is no Hungarian matching -- one
query per frame aligns directly with that frame's GT. The reference gathers
GT-span frames into a flat slice (criterion.py:160-171); here every loss is a
mask-weighted reduction over the padded [B, T] axes, which keeps the whole
step inside one jit.

DDP equivalence (global-batch form). The reference computes per-RANK losses
(B=1 clip each) and DDP averages gradients; the exact global-batch equivalent
is: per-CLIP reductions with each clip's OWN duration as denominator, then a
mean over the global batch. With `num_boxes = clamp(global_box_count / B, 1)`
(the psum'd normalizer, ref criterion.py:173-178), per-clip box sums divided
by num_boxes and batch-averaged reproduce the reference's
DDP-mean-of-per-rank-losses bit-for-bit in expectation and exactly for the
published 1-clip-per-device recipe. This form needs NO manual collectives:
under jit with a batch-sharded input, XLA inserts the reductions over ICI.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.batch import VideoTargets
from ..ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou_pairwise
from ..ops.misc import NEG_INF
from ..ops.sted import gaussian_sted_target


def _loss_boxes(pred_boxes, targets: VideoTargets, num_boxes, b):
    """L1 + GIoU on frames inside the GT span. ref criterion.py:26-44.

    ref per-rank: sum / num_boxes, then DDP-mean over ranks -> here
    total-sum / (B * num_boxes).
    """
    bm = targets.box_valid.astype(jnp.float32)
    denom = b * jnp.maximum(num_boxes, 1.0)
    l1 = jnp.abs(pred_boxes - targets.boxes).sum(-1)
    loss_bbox = (l1 * bm).sum() / denom
    giou = generalized_box_iou_pairwise(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(targets.boxes)
    )
    loss_giou = ((1.0 - giou) * bm).sum() / denom
    return {"loss_bbox": loss_bbox, "loss_giou": loss_giou}


def _loss_sted(pred_sted, targets: VideoTargets, time_mask, sigma):
    """KL(pred || gaussian at GT boundary). ref criterion.py:64-109.

    Per-clip `.mean()` over the clip's own duration, batch-averaged.
    """
    eps = 1e-6
    t = pred_sted.shape[1]
    tm = time_mask.astype(jnp.float32)
    durations = jnp.maximum(tm.sum(-1), 1.0)  # [B]

    logits = jnp.where(time_mask[:, :, None], pred_sted, NEG_INF)

    def one(boundary_idx, channel):
        target = gaussian_sted_target(t, boundary_idx, sigma, time_mask=time_mask)
        pred = jax.nn.softmax(logits[:, :, channel], axis=1)
        kl = pred * jnp.log((pred + eps) / jnp.maximum(target, 1e-12))
        return (kl * tm).sum(-1)  # [B]

    per_clip = one(targets.temp_bound[:, 0], 0) + one(targets.temp_bound[:, 1], 1)
    return {"loss_sted": jnp.mean(per_clip / durations)}


def _loss_guided_attn(weights, targets: VideoTargets, time_mask):
    """Push temporal self-attn mass off rows outside the GT span.

    ref criterion.py:111-130: rows inside the span (or padded) are dropped;
    remaining (negative) rows pay -log(1 - w) summed over columns, normalized
    by the per-clip negative count, summed over rows, averaged over batch.
    """
    eps = 1e-6
    t = time_mask.shape[1]
    pos = jnp.arange(t)[None, :]
    in_span = (pos >= targets.temp_bound[:, :1]) & (pos <= targets.temp_bound[:, 1:2])
    negative = time_mask & ~in_span  # [B, T] rows that pay the loss
    loss = -jnp.log(1.0 - weights + eps)  # [B, T, T]
    # padded columns never exist in the reference's unpadded per-rank view;
    # mask them so stray attention mass on padding cannot leak into the loss
    col_valid = time_mask[:, None, :].astype(loss.dtype)
    loss = loss * negative[:, :, None].astype(loss.dtype) * col_valid
    nb_neg = negative.sum(-1).astype(jnp.float32) + eps
    per_clip = loss.sum((1, 2)) / nb_neg
    return {"loss_guided_attn": jnp.mean(per_clip)}


def _loss_actioness(pred_actioness, targets: VideoTargets, time_mask, eos_coef):
    """Per-frame BCE with EOS down-weighting outside the span. ref criterion.py:46-62."""
    logits = pred_actioness.squeeze(-1)
    labels = targets.actioness.astype(jnp.float32)
    t = logits.shape[1]
    pos = jnp.arange(t)[None, :]
    in_span = (pos >= targets.temp_bound[:, :1]) & (pos <= targets.temp_bound[:, 1:2])
    weight = jnp.where(in_span, 1.0, eos_coef)
    tm = time_mask.astype(jnp.float32)
    durations = jnp.maximum(tm.sum(-1), 1.0)
    # numerically-stable BCE-with-logits
    bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_clip = (bce * weight * tm).sum(-1) / durations
    return {"loss_actioness": jnp.mean(per_clip)}


def video_stg_loss(
    outputs: Dict,
    targets: VideoTargets,
    time_mask: jnp.ndarray,
    num_boxes: jnp.ndarray,
    sigma: float = 2.0,
    eos_coef: float = 0.1,
    use_attn: bool = True,
    use_actioness: bool = True,
) -> Dict[str, jnp.ndarray]:
    """All losses incl. per-aux-layer replicas. ref criterion.py:151-208.

    Args:
        outputs: model output dict (pred_boxes [B,T,4] cxcywh normalized, ...).
        time_mask: [B, T] bool valid frames.
        num_boxes: scalar = clamp(global GT box count / B, 1) -- the
            reference's cross-rank-averaged normalizer.
    """
    b = time_mask.shape[0]

    def single(out):
        losses = {}
        losses.update(_loss_boxes(out["pred_boxes"], targets, num_boxes, b))
        losses.update(_loss_sted(out["pred_sted"], targets, time_mask, sigma))
        if use_attn and "weights" in out:
            losses.update(_loss_guided_attn(out["weights"], targets, time_mask))
        if use_actioness and "pred_actioness" in out:
            losses.update(
                _loss_actioness(out["pred_actioness"], targets, time_mask, eos_coef)
            )
        return losses

    losses = single(outputs)
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        for k, v in single(aux).items():
            losses[f"{k}_{i}"] = v
    return losses


def build_weight_dict(cfg) -> Dict[str, float]:
    """Loss coefficients incl. aux replicas. ref models/__init__.py:11-28."""
    s = cfg.SOLVER
    wd = {"loss_bbox": s.BBOX_COEF, "loss_giou": s.GIOU_COEF, "loss_sted": s.TEMP_COEF}
    if cfg.MODEL.STCAT.USE_ACTION:
        wd["loss_actioness"] = s.ACTIONESS_COEF
    if s.USE_ATTN:
        wd["loss_guided_attn"] = s.ATTN_COEF
    if s.USE_AUX_LOSS:
        aux = {}
        for i in range(cfg.MODEL.STCAT.DEC_LAYERS - 1):
            aux.update({f"{k}_{i}": v for k, v in wd.items()})
        wd.update(aux)
    return wd
