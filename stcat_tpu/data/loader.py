"""Prefetching data loader: worker pool -> fixed-shape batches -> device queue.

Replaces torch DataLoader + DistributedSampler + IterationBasedBatchSampler
(datasets/build.py:85-181, datasets/samplers/). Single-host design: the loader
produces GLOBAL batches with leading axis B = mesh size x per-chip batch; the
train step shards them over the 'data' mesh axis. Multi-host: each host
constructs a loader over its own index shard (shard_index / num_shards).

  - epoch reshuffle by seed+epoch (ref DistributedSampler.set_epoch);
  - iteration-based infinite stream with start_iter resume
    (ref IterationBasedBatchSampler, samplers/iteration_based_batch_sampler.py);
  - PREFETCH_DEPTH whole batches in flight: a batch pool pipelines
    decode+assembly of upcoming iterations against device execution of the
    current one (the host never sits on the critical path while the chip
    computes), with per-sample decode fanned out to a sample pool;
  - raw mode (cfg.TPU.DEVICE_PREPROCESS): samples stay uint8 and carry a
    TransformPlan; pixels are resampled/normalized on device
    (ops/preprocess.py), so host work per clip is decode + one memcpy;
  - eval wrap-around rows (ref DistributedSampler padding) are not decoded
    twice: padded rows reuse a real sample's arrays and are marked
    meta["pad"]=True so the engine skips them -- each item is evaluated
    exactly once and padding costs no decode.
"""

from __future__ import annotations

import math
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from ..config import Config
from ..core.batch import VideoBatch, VideoTargets
from .batching import (
    build_batch, build_raw_batch, pick_bucket, raw_batch_signature,
)
from .tokenize import build_tokenizer


class Loader:
    def __init__(
        self,
        cfg: Config,
        dataset,
        global_batch: int,
        is_train: bool,
        start_iter: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        num_workers: Optional[int] = None,
        seed: Optional[int] = None,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.global_batch = global_batch
        self.is_train = is_train
        self.start_iter = start_iter
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.seed = cfg.SEED if seed is None else seed
        self.tokenizer = build_tokenizer(cfg)
        # raw (on-device-preprocess) mode needs dataset cooperation
        # (GroundingDataset.supports_raw); plain datasets keep the legacy
        # host-transform contract
        self.raw = bool(cfg.TPU.DEVICE_PREPROCESS) and bool(
            getattr(dataset, "supports_raw", False)
        )
        if cfg.TPU.INGEST_LAYOUT not in ("rgb", "yuv420"):
            raise ValueError(
                f"TPU.INGEST_LAYOUT={cfg.TPU.INGEST_LAYOUT!r}: "
                "expected 'rgb' or 'yuv420'"
            )
        self.num_workers = (
            cfg.DATALOADER.NUM_WORKERS if num_workers is None else num_workers
        )

        n = len(dataset)
        self.iters_per_epoch = max(1, math.ceil(n / (global_batch * num_shards)))
        self._epoch_cache: Optional[Tuple[int, np.ndarray, np.ndarray]] = None
        self._orientation: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    def _epoch_indices(self, epoch: int) -> Tuple[np.ndarray, np.ndarray]:
        """This shard's index stream for one epoch, plus a wrap-around-pad
        mask (True = the row repeats an item already covered this epoch)."""
        # computed once per epoch, not per iteration: at VidSTG scale the
        # permutation + grouping is milliseconds of host work per call
        if self._epoch_cache is not None and self._epoch_cache[0] == epoch:
            return self._epoch_cache[1], self._epoch_cache[2]
        n = len(self.dataset)
        if self.is_train and self.cfg.SOLVER.SHUFFLE:
            rng = np.random.default_rng(self.seed + epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.cfg.DATALOADER.ASPECT_RATIO_GROUPING and hasattr(self.dataset, "items"):
            # batch-level grouping (ref GroupedBatchSampler semantics,
            # datasets/samplers/grouped_batch_sampler.py, bins at ratio 1):
            # walk the permutation, buffering per orientation, and emit a
            # GLOBAL batch whenever a buffer fills -- every batch is
            # single-orientation (no padded-canvas waste) while batch
            # composition stays LOCAL to the permutation (an epoch-wide
            # landscape-then-portrait sort would correlate orientation with
            # epoch position and distort the shuffle)
            if self._orientation is None:
                items = self.dataset.items
                self._orientation = np.asarray(
                    [items[i]["width"] >= items[i]["height"] for i in range(n)]
                )
            gb = self.global_batch * self.num_shards
            buffers = {True: [], False: []}
            order = []
            for i in idx:
                buf = buffers[bool(self._orientation[i])]
                buf.append(i)
                if len(buf) == gb:
                    order.extend(buf)
                    buf.clear()
            # epoch-tail leftovers: emit per group in permutation order (the
            # last <2 batches may mix orientations, as the ref sampler's
            # drop_uneven=False tail does)
            order.extend(buffers[True])
            order.extend(buffers[False])
            idx = np.asarray(order, dtype=idx.dtype)
        # pad so every shard x batch slot is filled (ref DistributedSampler
        # wraps around), then take this host's shard
        total = self.iters_per_epoch * self.global_batch * self.num_shards
        pad = np.arange(total) >= n
        idx = np.resize(idx, total)
        shard = idx[self.shard_index:: self.num_shards]
        shard_pad = pad[self.shard_index:: self.num_shards]
        self._epoch_cache = (epoch, shard, shard_pad)
        return shard, shard_pad

    def _load_sample(self, index: int, it: int, plan_only: bool = False):
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + it) % (2**31) + int(index)
        )
        if plan_only:
            return self.dataset.__getitem__(int(index), rng=rng, plan_only=True)
        if self.raw:
            return self.dataset.__getitem__(int(index), rng=rng, raw=True)
        return self.dataset.__getitem__(int(index), rng=rng)

    def scan_signatures(self, epochs: int = 1) -> Dict[tuple, list]:
        """Enumerate the distinct compiled-shape signatures this loader can
        emit, WITHOUT decoding a single pixel.

        Replays the exact epoch-index/rng streams of the real iterator
        (same permutation, same per-(iteration, index) sample rng -- the
        plan draws before decode and decode consumes no randomness) through
        plan-only samples, and keys each batch by
        batching.raw_batch_signature. Returns {signature: exemplar sample
        list} -- feeding an exemplar through _make_batch yields a batch
        that hits the same jit cache entry as the real one. Train mode
        scans `epochs` epochs (augmentation draws differ per epoch); eval
        is deterministic, one pass."""
        if not self.raw:
            raise ValueError(
                "scan_signatures targets the raw (TPU.DEVICE_PREPROCESS) "
                "path; legacy host-transform batches key only on "
                "(bucket, resolution) and do not need precompilation"
            )
        sigs: Dict[tuple, list] = {}
        buckets = self.cfg.TPU.FRAME_BUCKETS
        for epoch in range(epochs if self.is_train else 1):
            indices, pad = self._epoch_indices(epoch)
            for within in range(self.iters_per_epoch):
                it = epoch * self.iters_per_epoch + within
                sl = slice(
                    within * self.global_batch, (within + 1) * self.global_batch
                )
                rows = indices[sl]
                if self.is_train:
                    samples = [
                        self._load_sample(int(r), it, plan_only=True)
                        for r in rows
                    ]
                else:
                    # mirror _eval_iter EXACTLY: wrap-around pad rows reuse
                    # the batch's FIRST REAL sample, so the padded batch's
                    # geometry comes from the real rows, not from the
                    # wrapped index's own item (which may differ in size /
                    # duration and would scan a phantom signature while the
                    # real padded-batch signature goes uncovered)
                    rpad = pad[sl]
                    real = [
                        (j, self._load_sample(int(r), within, plan_only=True))
                        for j, r in enumerate(rows)
                        if not rpad[j]
                    ]
                    if not real:
                        real = [(0, self._load_sample(int(rows[0]), within,
                                                      plan_only=True))]
                        rpad = np.ones_like(rpad)
                    got = dict(real)
                    filler = {**got[real[0][0]], "pad": True}
                    samples = [
                        got[j] if (j in got and not rpad[j]) else filler
                        for j in range(len(rows))
                    ]
                sig = raw_batch_signature(samples, buckets)
                sigs.setdefault(sig, samples)
        return sigs

    def _make_batch(self, samples) -> Tuple[VideoBatch, VideoTargets, list]:
        t_max = max(len(s["actioness"]) for s in samples)
        t_bucket = pick_bucket(t_max, self.cfg.TPU.FRAME_BUCKETS)
        build = build_raw_batch if self.raw else build_batch
        return build(
            samples, t_bucket, self.tokenizer, self.cfg.INPUT.MAX_QUERY_LEN
        )

    # ------------------------------------------------------------------
    def __iter__(self) -> Iterator[Tuple[VideoBatch, VideoTargets, list]]:
        if self.is_train:
            return self._train_iter()
        return self._eval_iter()

    def _pipelined(self, load_batch, first: int, last: int):
        """Yield load_batch(i) for i in [first, last) with PREFETCH_DEPTH
        batches in flight: assembly of iteration i+k overlaps the device
        executing iteration i."""
        depth = max(1, self.cfg.DATALOADER.PREFETCH_DEPTH)
        batch_pool = ThreadPoolExecutor(max_workers=depth)
        sample_pool = ThreadPoolExecutor(max_workers=max(1, self.num_workers))
        try:
            window: deque = deque()
            nxt = first
            while nxt < min(first + depth, last):
                window.append(batch_pool.submit(load_batch, nxt, sample_pool))
                nxt += 1
            while window:
                fut = window.popleft()
                if nxt < last:
                    window.append(batch_pool.submit(load_batch, nxt, sample_pool))
                    nxt += 1
                yield fut.result()
        finally:
            batch_pool.shutdown(wait=False)
            sample_pool.shutdown(wait=False)

    def _train_iter(self):
        """Infinite iteration-counted stream (ref IterationBasedBatchSampler)."""
        max_iter = self.cfg.SOLVER.MAX_EPOCH * self.iters_per_epoch

        def load_batch(i, sample_pool):
            epoch, within = divmod(i, self.iters_per_epoch)
            indices, _ = self._epoch_indices(epoch)
            rows = indices[within * self.global_batch:(within + 1) * self.global_batch]
            futs = [sample_pool.submit(self._load_sample, r, i) for r in rows]
            return self._make_batch([f.result() for f in futs])

        return self._pipelined(load_batch, self.start_iter, max_iter)

    def _eval_iter(self):
        indices, pad = self._epoch_indices(0)
        n_batches = len(indices) // self.global_batch

        def load_batch(bi, sample_pool):
            sl = slice(bi * self.global_batch, (bi + 1) * self.global_batch)
            rows, rpad = indices[sl], pad[sl]
            real = [
                (j, sample_pool.submit(self._load_sample, r, bi))
                for j, r in enumerate(rows)
                if not rpad[j]
            ]
            if not real:
                # a shard whose whole batch is wrap-around padding (tiny
                # dataset on a big mesh): decode one row just to fill the
                # fixed shapes; every prediction is skipped via meta["pad"]
                real = [(0, sample_pool.submit(self._load_sample, rows[0], bi))]
                rpad = np.ones_like(rpad)
            got = {j: f.result() for j, f in real}
            # wrap-around rows: reuse a real sample's arrays (no decode) and
            # mark them so the eval engine skips their predictions
            filler = {**got[real[0][0]], "pad": True}
            samples = [
                got[j] if (j in got and not rpad[j]) else filler
                for j in range(len(rows))
            ]
            return self._make_batch(samples)

        return self._pipelined(load_batch, 0, n_batches)


def make_loader(cfg: Config, dataset, mesh, mode: str, start_iter: int = 0) -> Loader:
    """ref datasets/build.py:141-181 (1 clip per chip).

    Multi-host: each host loads the index shard for its own devices
    (ref DistributedSampler semantics, datasets/build.py:85-88).
    """
    import jax

    num_hosts = jax.process_count()
    local_devices = mesh.size // num_hosts if num_hosts > 1 else mesh.size
    return Loader(
        cfg,
        dataset,
        global_batch=cfg.SOLVER.BATCH_SIZE * local_devices,
        is_train=(mode == "train"),
        start_iter=start_iter,
        shard_index=jax.process_index(),
        num_shards=num_hosts,
    )
