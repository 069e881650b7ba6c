"""Online inference: a load-once predictor + micro-batching request queue.

The reference has no serving story — its only inference surface is the batch
eval CLI (ref scripts/test_net.py:17-104). Production deployment needs the
opposite shape: a long-lived process that owns the compiled program and the
device-resident weights, accepts (frames, sentence) requests one at a time,
and keeps the chip busy by batching concurrent requests. This module is that
layer, built on the same pieces as evaluation so serving and eval cannot
drift:

  - pixel path: raw uint8 frames ship to the device and are resampled /
    normalized on-chip (ops/preprocess.py) — the production ingest layout;
  - eval protocol: the reference's two-stream temporal supersampling with
    box interpolation and sted envelope (engine/evaluate.py:97-119) via
    eval.engine.merge_two_streams;
  - fixed shapes: requests pad to a fixed batch lane count and a frame
    bucket, so a serving process compiles a handful of programs at warmup
    and never recompiles under traffic.

API:
    pred = GroundingPredictor(cfg, weights="out/checkpoints")
    result = pred.predict(frames_u8, "a person waves")   # single request
    with MicroBatcher(pred, max_batch=4) as mb:          # concurrent callers
        fut = mb.submit(frames_u8, "a person waves")
        result = fut.result()

`result`: {"boxes": {frame_id: [x1, y1, x2, y2]}, "span": [start, end+1]}
with boxes in ORIGINAL pixel coordinates and span in frame_ids units.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from .core.mesh import make_mesh, shard_batch, shard_state
from .data.batching import build_raw_batch, pick_bucket
from .data.tokenize import build_tokenizer
from .data.transforms import build_transforms
from .eval.engine import _decode_rows, merge_two_streams
from .models import STCATNet
from .models.postprocess import postprocess
from .train.checkpoint import load_weights_for_eval
from .train.step import make_eval_forward

_postprocess_jit = jax.jit(postprocess)


class GroundingPredictor:
    """Owns the model, weights, tokenizer, and compiled forward.

    One instance per process; thread-safe for predict() (calls serialize on
    an internal lock — use MicroBatcher to get cross-request batching
    instead of queueing on the lock).
    """

    def __init__(self, cfg, weights: str = "", mesh=None, logger=None,
                 max_batch: int = 1):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.max_batch = max(1, int(max_batch))
        self.tokenizer = build_tokenizer(cfg)
        from .data.tokenize import check_tokenizer_for_weights

        check_tokenizer_for_weights(
            cfg, self.tokenizer, weights or cfg.MODEL.WEIGHT, what="inference"
        )
        self.transform = build_transforms(cfg, is_train=False)
        self.model = STCATNet(cfg)
        self._lock = threading.Lock()

        # init for shapes only, on a minimal canvas (param shapes are
        # input-size independent), then load the real weights
        from .core.batch import VideoBatch

        t0 = int(min(cfg.TPU.FRAME_BUCKETS))
        dummy = VideoBatch(
            frames=np.zeros((1, t0, 64, 64, 3), np.float32),
            frame_valid=np.ones((1, t0), bool),
            pixel_valid=np.ones((1, t0, 64, 64), bool),
            token_ids=np.zeros((1, cfg.INPUT.MAX_QUERY_LEN), np.int32),
            token_valid=np.ones((1, cfg.INPUT.MAX_QUERY_LEN), bool),
        )
        variables = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy)
        params = variables["params"]
        constants = variables.get("constants", {})
        params, constants = load_weights_for_eval(
            cfg, params, constants, weights or cfg.MODEL.WEIGHT, logger
        )
        self.params = shard_state(params, self.mesh)
        self.constants = shard_state(constants, self.mesh)
        # serving stacks the two streams on the HOST (predict_batch's lane
        # protocol: replica-padded fixed lane count, degenerate 1-frame
        # clips), so the forward must not device-split the stacked batch
        self.fwd = make_eval_forward(
            cfg, self.model, self.mesh, example_params=self.params,
            device_split=False,
        )

    # ------------------------------------------------------------------
    def _raw_sample(self, frames: np.ndarray, text: str, item_id, fids,
                    pad: bool) -> Dict:
        t, h, w = frames.shape[:3]
        plan, _, text = self.transform.plan(
            (h, w), np.zeros((0, 4), np.float32), text,
            np.random.default_rng(0),  # eval plan draws nothing
        )
        return {
            "frames_u8": np.ascontiguousarray(frames),
            "plan": plan,
            # serving has no GT: a full-span dummy satisfies the shared
            # batch builder; targets are never read on this path
            "actioness": np.ones((t,), np.float32),
            "boxes_cxcywh": np.zeros((t, 4), np.float32),
            "text": text,
            "item_id": item_id,
            "frame_ids": list(fids),
            "ori_size": (h, w),
            "pad": pad,
        }

    def predict(self, frames: np.ndarray, text: str,
                frame_ids: Optional[Sequence[int]] = None) -> Dict:
        """One clip: frames uint8 [T, H, W, 3] (RGB), a sentence."""
        return self.predict_batch([(frames, text, frame_ids)])[0]

    def predict_batch(
        self, requests: List[Tuple[np.ndarray, str, Optional[Sequence[int]]]]
    ) -> List[Dict]:
        """Run up to max_batch requests in one stacked two-stream forward.

        The device batch is [2R lanes]: rows [0, R) are the even-frame
        streams, rows [R, 2R) the odd-frame streams (R = max_batch; short
        request lists pad with replica lanes that are decoded away)."""
        if not requests:
            return []
        if len(requests) > self.max_batch:
            out = []
            for i in range(0, len(requests), self.max_batch):
                out.extend(self.predict_batch(requests[i: i + self.max_batch]))
            return out

        reqs = list(requests)
        n_real = len(reqs)
        while len(reqs) < self.max_batch:  # fixed lane count: pad w/ replicas
            reqs.append(reqs[0])

        s0, s1, m_pairs = [], [], []
        for i, item in enumerate(reqs):
            frames, text = item[0], item[1]
            fids = item[2] if len(item) > 2 and item[2] is not None else None
            frames = np.asarray(frames)
            if frames.ndim != 4 or frames.shape[-1] != 3:
                raise ValueError(f"frames must be [T,H,W,3], got {frames.shape}")
            if frames.dtype != np.uint8:
                raise ValueError("frames must be uint8 RGB")
            t = frames.shape[0]
            fids = list(range(t)) if fids is None else list(fids)
            if len(fids) != t:
                raise ValueError(f"{len(fids)} frame_ids for {t} frames")
            pad = i >= n_real
            if t >= 2:
                s0.append(self._raw_sample(frames[0::2], text, i, fids[0::2], pad))
                s1.append(self._raw_sample(frames[1::2], text, i, fids[1::2], pad))
            else:
                # degenerate single-frame clip: duplicate the stream
                s0.append(self._raw_sample(frames, text, i, fids, pad))
                s1.append(self._raw_sample(frames, text, i, fids, True))

        t_bucket = pick_bucket(
            max(s["frames_u8"].shape[0] for s in s0 + s1),
            self.cfg.TPU.FRAME_BUCKETS,
        )
        batch, _targets, meta = build_raw_batch(
            s0 + s1, t_bucket, self.tokenizer, self.cfg.INPUT.MAX_QUERY_LEN
        )
        m1, m2 = meta[: len(s0)], meta[len(s0):]

        with self._lock:
            placed = shard_batch(batch, self.mesh)
            out = self.fwd(self.params, self.constants, placed)
            orig_sizes = np.asarray(
                [m["ori_size"] for m in m1 + m2], np.int32
            )
            boxes, s_idx, e_idx = jax.device_get(
                _postprocess_jit(
                    out["pred_boxes"], out["pred_sted"],
                    orig_sizes, placed.frame_valid,
                )
            )
        fv = np.asarray(placed.frame_valid)
        if all(m.get("pad") for m in m2):
            bbox_pred, temp_pred = _decode_rows(boxes, s_idx, e_idx, fv, m1, 0)
        else:
            bbox_pred, temp_pred = merge_two_streams(
                boxes, s_idx, e_idx, fv, m1, m2
            )
        return [
            {
                "boxes": {fid: bb[0] for fid, bb in bbox_pred[i].items()},
                "span": temp_pred[i]["sted"],
            }
            for i in range(n_real)
        ]


class MicroBatcher:
    """Groups concurrent predict() calls into stacked device batches.

    submit() returns a concurrent.futures.Future; a single dispatcher
    thread drains the queue, waits up to max_wait_ms for lane-mates, and
    runs predictor.predict_batch. Classic dynamic batching: latency cost is
    bounded by max_wait_ms, throughput approaches the batched forward rate.
    """

    def __init__(self, predictor: GroundingPredictor, max_batch: int = None,
                 max_wait_ms: float = 5.0):
        self.predictor = predictor
        self.max_batch = max_batch or predictor.max_batch
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, frames: np.ndarray, text: str,
               frame_ids: Optional[Sequence[int]] = None) -> Future:
        fut: Future = Future()
        self._q.put((fut, (frames, text, frame_ids)))
        return fut

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            group = [first]
            deadline = None
            while len(group) < self.max_batch:
                if deadline is None:
                    import time

                    deadline = time.monotonic() + self.max_wait
                try:
                    import time

                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    group.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            futs, reqs = zip(*group)
            try:
                results = self.predictor.predict_batch(list(reqs))
                for fut, res in zip(futs, results):
                    fut.set_result(res)
            except Exception as e:  # propagate to every caller in the group
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
