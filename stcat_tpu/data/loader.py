"""Prefetching data loader: worker pool -> fixed-shape batches -> device queue.

Replaces torch DataLoader + DistributedSampler + IterationBasedBatchSampler
(datasets/build.py:85-181, datasets/samplers/). Single-host design: the loader
produces GLOBAL batches with leading axis B = mesh size x per-chip batch; the
train step shards them over the 'data' mesh axis. Multi-host: each host
constructs a loader over its own index shard (shard_index / num_shards).

  - epoch reshuffle by seed+epoch (ref DistributedSampler.set_epoch);
  - iteration-based infinite stream with start_iter resume
    (ref IterationBasedBatchSampler, samplers/iteration_based_batch_sampler.py);
  - decode/transform in a thread pool (ffmpeg runs in subprocesses, so
    workers overlap despite the GIL);
  - double-buffered host->device prefetch (jax.device_put is async).
"""

from __future__ import annotations

import math
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

from ..config import Config
from ..core.batch import VideoBatch, VideoTargets
from .batching import build_batch, pick_bucket
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
        self.num_workers = (
            cfg.DATALOADER.NUM_WORKERS if num_workers is None else num_workers
        )

        n = len(dataset)
        self.iters_per_epoch = max(1, math.ceil(n / (global_batch * num_shards)))
        self._epoch_cache: Optional[Tuple[int, np.ndarray]] = None
        self._orientation: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    def _epoch_indices(self, epoch: int) -> np.ndarray:
        # computed once per epoch, not per iteration: at VidSTG scale the
        # permutation + grouping is milliseconds of host work per call
        if self._epoch_cache is not None and self._epoch_cache[0] == epoch:
            return self._epoch_cache[1]
        n = len(self.dataset)
        if self.is_train and self.cfg.SOLVER.SHUFFLE:
            rng = np.random.default_rng(self.seed + epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.cfg.DATALOADER.ASPECT_RATIO_GROUPING and hasattr(self.dataset, "items"):
            # batch portrait vs landscape clips separately so the padded
            # canvas wastes no pixels (ref GroupedBatchSampler semantics,
            # datasets/samplers/grouped_batch_sampler.py, bins at ratio 1)
            if self._orientation is None:
                items = self.dataset.items
                self._orientation = np.asarray(
                    [items[i]["width"] >= items[i]["height"] for i in range(n)]
                )
            is_landscape = self._orientation[idx]
            idx = np.concatenate([idx[is_landscape], idx[~is_landscape]])
        # pad so every shard x batch slot is filled (ref DistributedSampler
        # wraps around), then take this host's shard
        total = self.iters_per_epoch * self.global_batch * self.num_shards
        idx = np.resize(idx, total)
        shard = idx[self.shard_index:: self.num_shards]
        self._epoch_cache = (epoch, shard)
        return shard

    def _load_sample(self, index: int, it: int):
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + it) % (2**31) + int(index)
        )
        return self.dataset.__getitem__(int(index), rng=rng)

    def _make_batch(self, samples) -> Tuple[VideoBatch, VideoTargets, list]:
        t_max = max(s["frames"].shape[0] for s in samples)
        t_bucket = pick_bucket(t_max, self.cfg.TPU.FRAME_BUCKETS)
        return build_batch(
            samples, t_bucket, self.tokenizer, self.cfg.INPUT.MAX_QUERY_LEN
        )

    # ------------------------------------------------------------------
    def __iter__(self) -> Iterator[Tuple[VideoBatch, VideoTargets, list]]:
        if self.is_train:
            return self._train_iter()
        return self._eval_iter()

    def _train_iter(self):
        """Infinite iteration-counted stream (ref IterationBasedBatchSampler)."""
        it = self.start_iter
        max_iter = self.cfg.SOLVER.MAX_EPOCH * self.iters_per_epoch
        pool = ThreadPoolExecutor(max_workers=max(1, self.num_workers))
        pending: "queue.Queue" = queue.Queue(maxsize=self.cfg.DATALOADER.PREFETCH_DEPTH)

        def producer():
            i = self.start_iter
            while i < max_iter:
                epoch = i // self.iters_per_epoch
                within = i % self.iters_per_epoch
                indices = self._epoch_indices(epoch)
                rows = indices[within * self.global_batch:(within + 1) * self.global_batch]
                futs = [pool.submit(self._load_sample, r, i) for r in rows]
                samples = [f.result() for f in futs]
                pending.put((i, self._make_batch(samples)))
                i += 1
            pending.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            got = pending.get()
            if got is None:
                break
            i, batch = got
            yield batch
        pool.shutdown(wait=False)

    def _eval_iter(self):
        indices = self._epoch_indices(0)
        pool = ThreadPoolExecutor(max_workers=max(1, self.num_workers))
        n_batches = len(indices) // self.global_batch
        # pipeline one batch ahead
        def load(bi):
            rows = indices[bi * self.global_batch:(bi + 1) * self.global_batch]
            futs = [pool.submit(self._load_sample, r, bi) for r in rows]
            return self._make_batch([f.result() for f in futs])

        nxt = load(0) if n_batches else None
        for bi in range(n_batches):
            cur = nxt
            nxt = load(bi + 1) if bi + 1 < n_batches else None
            yield cur
        pool.shutdown(wait=False)


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
