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

from ..core.batch import VideoBatch, stack_streams, subsample_stream
from ..models.postprocess import postprocess

# module-level so the compile caches across do_eval calls (a fresh jit
# wrapper per pass would retrace+recompile every validation run)
_postprocess_jit = jax.jit(postprocess)


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


def subsample_batch(batch, meta: List[Dict], start: int):
    """Even/odd frame stream (ref utils/misc.py:55-65 NestedTensor.subsample).
    Works for VideoBatch and RawVideoBatch (core/batch.py subsample_stream)."""
    sub_meta = [
        {**m, "frame_ids": m["frame_ids"][start::2]} for m in meta
    ]
    return subsample_stream(batch, start), sub_meta


def _decode_rows(boxes, s_idx, e_idx, frame_valid, meta, row0):
    """Rows [row0, row0+len(meta)) of a postprocessed batch -> pred dicts.
    Wrap-around filler rows (meta['pad'], data/loader.py) are skipped so each
    dataset item contributes exactly one prediction."""
    bbox_pred, temp_pred = {}, {}
    for j, m in enumerate(meta):
        if m.get("pad"):
            continue
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


def merge_two_streams(boxes, s_idx, e_idx, frame_valid, m1, m2):
    """Merge the postprocessed even/odd streams of stacked clips into
    per-item predictions: union the per-frame boxes, linearly interpolate
    the frame-id gaps, and take the min/max envelope of the two streams'
    temporal bounds (ref engine/evaluate.py:111-119). Rows [0, len(m1)) are
    stream 0, rows [len(m1), len(m1)+len(m2)) stream 1."""
    bbox1, temp1 = _decode_rows(boxes, s_idx, e_idx, frame_valid, m1, 0)
    bbox2, temp2 = _decode_rows(boxes, s_idx, e_idx, frame_valid, m2, len(m1))
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


def do_eval(cfg, model, params, constants, loader, evaluator, fwd, logger=None,
            mesh=None):
    """Full evaluation pass. ref engine/evaluate.py:80-130.

    Both temporal streams go through ONE stacked forward of batch 2B
    (near-2x eval throughput over the reference's serial streams). With a
    mesh (single-process), stream subsampling/stacking AND the host->device
    transfer run on a prefetch thread so the chip never waits on the
    next batch's placement (core/prefetch.py).
    """
    from ..core.dist import is_main_process, synchronize

    def _stack(item):
        batch, _targets, meta = item
        b1, m1 = subsample_batch(batch, meta, 0)
        b2, m2 = subsample_batch(batch, meta, 1)
        return stack_streams(b1, b2), m1, m2

    import jax as _jax

    # TPU.EVAL_DEVICE_SPLIT: ship the batch once, split+stack inside the
    # jitted forward (core/batch.device_split_streams); only the meta
    # frame-id split stays on the host. Single-process only. The gate MUST
    # match the one make_eval_forward was built with (train/step.py
    # eval_device_split_active) or batches would be split twice/never.
    from ..train.step import eval_device_split_active

    device_split = mesh is not None and eval_device_split_active(cfg)

    def _split_meta(meta):
        m1 = [{**m, "frame_ids": m["frame_ids"][0::2]} for m in meta]
        m2 = [{**m, "frame_ids": m["frame_ids"][1::2]} for m in meta]
        return m1, m2

    if mesh is not None:
        from ..core.mesh import shard_batch

        sp = cfg.TPU.SEQUENCE_PARALLEL

        def _place(item):
            if device_split:
                batch, _targets, meta = item
                m1, m2 = _split_meta(meta)
                return shard_batch(batch, mesh, sequence_parallel=sp), m1, m2
            stacked, m1, m2 = _stack(item)
            return shard_batch(stacked, mesh, sequence_parallel=sp), m1, m2

        if _jax.process_count() == 1:
            from ..core.prefetch import device_prefetch

            stream = device_prefetch(iter(loader), _place, depth=2)
        else:
            # multi-host: jit rejects host numpy under cross-process
            # shardings; shard_batch's host_local_array_to_global_array
            # path assembles the global arrays, and it must run on the
            # MAIN thread in collective lockstep across hosts
            stream = (_place(x) for x in loader)
    else:
        stream = (_stack(x) for x in loader)

    multi = mesh is not None and _jax.process_count() > 1

    def _local(arr):
        """Global jax.Array -> THIS host's rows (the inverse of shard_batch's
        multi-host assembly). Meta (m1+m2) is host-local, so postprocess and
        row decoding run on local rows only; the evaluator's host gather
        merges predictions afterwards (ref utils/comm.py:55-98).

        Reads the host's own addressable shards directly -- no cross-host
        device transfer (which this backend may not support), just host
        copies of locally-resident rows, deduped by global row index (a
        2-D (data, model) mesh replicates each row block over 'model')."""
        if getattr(arr, "is_fully_addressable", True):
            return np.asarray(arr)
        rows = {}
        for s in arr.addressable_shards:
            k = s.index[0].start or 0
            if k not in rows:
                rows[k] = np.asarray(s.data)
        return np.concatenate([rows[k] for k in sorted(rows)], axis=0)

    def _merge(boxes, s_idx, e_idx, fv, m1, m2):
        bbox_pred, temp_pred = merge_two_streams(boxes, s_idx, e_idx, fv, m1, m2)
        evaluator.update(bbox_pred)
        evaluator.video_update(temp_pred)

    if multi:
        for stacked, m1, m2 in stream:
            out = fwd(params, constants, stacked)
            orig_sizes = np.asarray(
                [m["ori_size"] for m in m1 + m2], np.int32
            )
            boxes, s_idx, e_idx = jax.device_get(
                postprocess(
                    _local(out["pred_boxes"]), _local(out["pred_sted"]),
                    orig_sizes, _local(stacked.frame_valid),
                )
            )
            _merge(boxes, s_idx, e_idx, _local(stacked.frame_valid), m1, m2)
    else:
        # software-pipelined: forwards + postprocess are DISPATCHED per
        # clip but fetched PIPELINE_DEPTH clips later, so the host-side
        # decode of clip i overlaps the device running clips i+1..i+K and
        # a high-latency link (tunneled chip) pays its per-fetch round
        # trip once per drain instead of stalling every forward (measured
        # 5.1 s/clip -> see docs/STATUS.md; the reference evaluates
        # strictly serially, engine/evaluate.py:80-130)
        from collections import deque

        pending = deque()

        def _drain(item):
            res, fv_dev, m1, m2 = item
            boxes, s_idx, e_idx = jax.device_get(res)
            _merge(boxes, s_idx, e_idx, np.asarray(fv_dev), m1, m2)

        for stacked, m1, m2 in stream:
            out = fwd(params, constants, stacked)
            # device-split mode: `stacked` is the UNSPLIT batch; the jitted
            # forward did the split and returns the split frame mask
            fv = out["frame_valid"] if device_split else stacked.frame_valid
            orig_sizes = np.asarray(
                [m["ori_size"] for m in m1 + m2], np.int32
            )
            res = _postprocess_jit(
                out["pred_boxes"], out["pred_sted"], orig_sizes, fv,
            )
            pending.append((res, fv, m1, m2))
            if len(pending) > 2:
                _drain(pending.popleft())
        while pending:
            _drain(pending.popleft())

    synchronize()
    evaluator.synchronize_between_processes()
    if logger is not None and is_main_process():
        logger.info("Inference complete; computing metrics")
    return evaluator.summarize()
