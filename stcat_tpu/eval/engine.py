"""Evaluation engine: two-stream temporal supersampling + box interpolation.

Reference: engine/evaluate.py. Test clips are sampled at 2x the train frame
rate, split into even/odd half-rate streams, each run through the model, and
the per-frame boxes merged + linearly interpolated back to the full rate;
sted bounds take the min/max envelope of the two streams (evaluate.py:97-119).

The model forwards are jitted data-parallel (one clip per chip); everything
after postprocess is cheap host-side python on small box arrays.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import numpy as np

from ..core.batch import VideoBatch
from ..models.postprocess import postprocess


def linear_interp_boxes(bbox_dict: Dict[int, List[List[float]]]) -> Dict:
    """Fill frame-id gaps by linear interpolation. ref evaluate.py:10-34."""
    fids = sorted(bbox_dict)
    if len(fids) < 2:
        return bbox_dict
    for a, b in zip(fids[:-1], fids[1:]):
        gap = b - a
        if gap > 1:
            left = np.asarray(bbox_dict[a][0], np.float64)
            right = np.asarray(bbox_dict[b][0], np.float64)
            delta = (right - left) / gap
            for s in range(1, gap):
                bbox_dict[a + s] = [(left + s * delta).tolist()]
    return {fid: bbox_dict[fid] for fid in sorted(bbox_dict)}


def subsample_batch(batch: VideoBatch, meta: List[Dict], start: int):
    """Even/odd frame stream (ref utils/misc.py:55-65 NestedTensor.subsample)."""
    sub = VideoBatch(
        frames=batch.frames[:, start::2],
        frame_valid=batch.frame_valid[:, start::2],
        pixel_valid=batch.pixel_valid[:, start::2],
        token_ids=batch.token_ids,
        token_valid=batch.token_valid,
    )
    sub_meta = [
        {**m, "frame_ids": m["frame_ids"][start::2]} for m in meta
    ]
    return sub, sub_meta


def stack_streams(b1: VideoBatch, b2: VideoBatch) -> VideoBatch:
    """Concatenate the even/odd streams along the batch axis (one forward of
    batch 2B instead of two of B -- the reference runs them serially,
    evaluate.py:106-109). The odd stream is one frame shorter when T is odd;
    pad it and mask via frame_valid."""
    t = b1.frames.shape[1]

    def pad_t(x):
        widths = [(0, 0)] * x.ndim
        widths[1] = (0, t - x.shape[1])
        return np.pad(np.asarray(x), widths)

    return VideoBatch(
        frames=np.concatenate([np.asarray(b1.frames), pad_t(b2.frames)], 0),
        frame_valid=np.concatenate(
            [np.asarray(b1.frame_valid), pad_t(b2.frame_valid)], 0
        ),
        pixel_valid=np.concatenate(
            [np.asarray(b1.pixel_valid), pad_t(b2.pixel_valid)], 0
        ),
        token_ids=np.concatenate(
            [np.asarray(b1.token_ids), np.asarray(b2.token_ids)], 0
        ),
        token_valid=np.concatenate(
            [np.asarray(b1.token_valid), np.asarray(b2.token_valid)], 0
        ),
    )


def _decode_rows(boxes, s_idx, e_idx, frame_valid, meta, row0):
    """Rows [row0, row0+len(meta)) of a postprocessed batch -> pred dicts."""
    bbox_pred, temp_pred = {}, {}
    for j, m in enumerate(meta):
        i = row0 + j
        fids = m["frame_ids"]
        n = int(np.asarray(frame_valid[i]).sum())
        assert n == len(fids), (n, len(fids))
        bbox_pred[m["item_id"]] = {
            fids[k]: [boxes[i, k].tolist()] for k in range(n)
        }
        temp_pred[m["item_id"]] = {
            "sted": [fids[int(s_idx[i])], fids[int(e_idx[i])] + 1],
            "qtype": m.get("qtype", "none"),
        }
    return bbox_pred, temp_pred


def single_forward(fwd, params, constants, batch: VideoBatch, meta: List[Dict]):
    """Run the model + postprocess one stream. ref evaluate.py:37-77."""
    out = fwd(params, constants, batch)
    orig_sizes = np.asarray([m["ori_size"] for m in meta], np.int32)
    boxes, s_idx, e_idx = jax.device_get(
        postprocess(
            out["pred_boxes"], out["pred_sted"],
            jax.device_put(orig_sizes), batch.frame_valid,
        )
    )
    return _decode_rows(boxes, s_idx, e_idx, batch.frame_valid, meta, 0)


def do_eval(cfg, model, params, constants, loader, evaluator, fwd, logger=None):
    """Full evaluation pass. ref engine/evaluate.py:80-130.

    Both temporal streams go through ONE stacked forward of batch 2B
    (near-2x eval throughput over the reference's serial streams).
    """
    from ..core.dist import is_main_process, synchronize

    for batch, _targets, meta in loader:
        b1, m1 = subsample_batch(batch, meta, 0)
        b2, m2 = subsample_batch(batch, meta, 1)
        stacked = stack_streams(b1, b2)
        out = fwd(params, constants, stacked)
        orig_sizes = np.asarray(
            [m["ori_size"] for m in m1 + m2], np.int32
        )
        boxes, s_idx, e_idx = jax.device_get(
            postprocess(
                out["pred_boxes"], out["pred_sted"],
                jax.device_put(orig_sizes), stacked.frame_valid,
            )
        )
        fv = np.asarray(stacked.frame_valid)
        bbox1, temp1 = _decode_rows(boxes, s_idx, e_idx, fv, m1, 0)
        bbox2, temp2 = _decode_rows(boxes, s_idx, e_idx, fv, m2, len(m1))

        bbox_pred, temp_pred = {}, {}
        for vid in bbox1:
            bbox1[vid].update(bbox2[vid])
            bbox_pred[vid] = linear_interp_boxes(bbox1[vid])
            temp_pred[vid] = {
                "sted": [
                    min(temp1[vid]["sted"][0], temp2[vid]["sted"][0]),
                    max(temp1[vid]["sted"][1], temp2[vid]["sted"][1]),
                ],
                "qtype": temp1[vid].get("qtype", "none"),
            }
        evaluator.update(bbox_pred)
        evaluator.video_update(temp_pred)

    synchronize()
    evaluator.synchronize_between_processes()
    if logger is not None and is_main_process():
        logger.info("Inference complete; computing metrics")
    return evaluator.summarize()
