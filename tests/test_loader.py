"""Loader semantics: epoch reshuffle, resume, sharding, aspect grouping,
two-stream subsampling, metrics writer."""

import json
import os

import numpy as np
import pytest

from stcat_tpu.core.metrics_writer import MetricsWriter
from stcat_tpu.data.loader import Loader
from stcat_tpu.eval.engine import subsample_batch
from helpers import make_batch_and_targets, tiny_cfg


class FakeDataset:
    """Returns index-stamped samples without any decode/transform cost."""

    def __init__(self, n=10, sizes=None):
        self.n = n
        self.items = [
            {"width": (sizes[i][0] if sizes else 64), "height": (sizes[i][1] if sizes else 48)}
            for i in range(n)
        ]

    def __len__(self):
        return self.n

    def __getitem__(self, index, rng=None):
        t = 4
        act = np.asarray([0, 1, 1, 0], np.float32)
        return {
            "frames": np.full((t, 8, 8, 3), index, np.float32),
            "boxes_cxcywh": np.asarray([[0.5, 0.5, 0.2, 0.2]] * 2, np.float32),
            "actioness": act,
            "text": f"sample {index}",
            "item_id": index,
            "frame_ids": list(range(t)),
            "ori_size": (8, 8),
        }


def make_loader(cfg, ds, gb=2, **kw):
    return Loader(cfg, ds, global_batch=gb, is_train=True, num_workers=1, **kw)


class TestLoader:
    def test_epoch_reshuffle_and_coverage(self):
        cfg = tiny_cfg(["TPU.FRAME_BUCKETS", "[4]", "SOLVER.MAX_EPOCH", 2])
        ds = FakeDataset(10)
        loader = make_loader(cfg, ds)
        seen = []
        for batch, targets, meta in loader:
            seen.append([m["item_id"] for m in meta])
        # 2 epochs x 5 iters/epoch
        assert len(seen) == 10
        e0 = [i for b in seen[:5] for i in b]
        e1 = [i for b in seen[5:] for i in b]
        assert sorted(e0) == list(range(10))
        assert sorted(e1) == list(range(10))
        assert e0 != e1  # reshuffled

    def test_resume_start_iter(self):
        cfg = tiny_cfg(["TPU.FRAME_BUCKETS", "[4]", "SOLVER.MAX_EPOCH", 2])
        ds = FakeDataset(10)
        full = [[m["item_id"] for m in meta] for _, _, meta in make_loader(cfg, ds)]
        resumed = [
            [m["item_id"] for m in meta]
            for _, _, meta in make_loader(cfg, ds, start_iter=3)
        ]
        assert resumed == full[3:]

    def test_host_sharding_disjoint(self):
        cfg = tiny_cfg(["TPU.FRAME_BUCKETS", "[4]", "SOLVER.MAX_EPOCH", 1])
        ds = FakeDataset(8)
        a = [m["item_id"] for _, _, meta in make_loader(cfg, ds, gb=2, shard_index=0, num_shards=2) for m in meta]
        b = [m["item_id"] for _, _, meta in make_loader(cfg, ds, gb=2, shard_index=1, num_shards=2) for m in meta]
        assert len(a) == len(b) == 4
        assert set(a).isdisjoint(set(b))
        assert sorted(a + b) == list(range(8))

    def test_eval_all_padding_shard(self):
        """A shard whose whole eval batch is wrap-around padding (tiny
        dataset on a big mesh) still yields fixed-shape batches; every row
        is meta['pad'] so the evaluator sees nothing from this shard."""
        cfg = tiny_cfg(["TPU.FRAME_BUCKETS", "[4]", "SOLVER.MAX_EPOCH", 1])
        ds = FakeDataset(1)
        loader = Loader(cfg, ds, global_batch=1, is_train=False,
                        num_workers=1, shard_index=1, num_shards=2)
        batches = list(loader)
        assert len(batches) == 1
        _, _, meta = batches[0]
        assert [m["pad"] for m in meta] == [True]
        # the sibling shard holds the one real item
        other = Loader(cfg, ds, global_batch=1, is_train=False,
                       num_workers=1, shard_index=0, num_shards=2)
        (_, _, meta0), = list(other)
        assert [m["pad"] for m in meta0] == [False]

    def test_aspect_grouping_separates_orientations(self):
        sizes = [(100, 50)] * 4 + [(50, 100)] * 4  # 4 landscape, 4 portrait
        cfg = tiny_cfg([
            "TPU.FRAME_BUCKETS", "[4]", "SOLVER.MAX_EPOCH", 1,
            "DATALOADER.ASPECT_RATIO_GROUPING", "true",
        ])
        ds = FakeDataset(8, sizes=sizes)
        for _, _, meta in make_loader(cfg, ds, gb=2):
            kinds = {
                "L" if ds.items[m["item_id"]]["width"] >= ds.items[m["item_id"]]["height"] else "P"
                for m in meta
            }
            assert len(kinds) == 1, f"mixed-orientation batch: {meta}"

    def test_aspect_grouping_uneven_covers_all_once(self):
        """Odd orientation counts: full batches stay single-orientation, the
        epoch tail may mix (ref GroupedBatchSampler drop_uneven=False), and
        every item still appears exactly once per epoch."""
        sizes = [(100, 50)] * 5 + [(50, 100)] * 3
        cfg = tiny_cfg([
            "TPU.FRAME_BUCKETS", "[4]", "SOLVER.MAX_EPOCH", 1,
            "DATALOADER.ASPECT_RATIO_GROUPING", "true",
        ])
        ds = FakeDataset(8, sizes=sizes)
        seen = []
        mixed = 0
        for _, _, meta in make_loader(cfg, ds, gb=2):
            ids = [m["item_id"] for m in meta]
            seen.extend(ids)
            kinds = {ds.items[i]["width"] >= ds.items[i]["height"] for i in ids}
            mixed += len(kinds) > 1
        assert sorted(seen) == list(range(8))
        assert mixed <= 2  # only the per-group leftovers may mix

    def test_aspect_grouping_is_batch_local(self):
        """Grouping must not globally sort the epoch: with alternating
        orientations, the first batch draws from the FRONT of the stream in
        both groups (an epoch-wide landscape-first sort would put every
        portrait clip in the back half)."""
        n = 16
        sizes = [(100, 50) if i % 2 == 0 else (50, 100) for i in range(n)]
        cfg = tiny_cfg([
            "TPU.FRAME_BUCKETS", "[4]", "SOLVER.MAX_EPOCH", 1,
            "DATALOADER.ASPECT_RATIO_GROUPING", "true",
            "SOLVER.SHUFFLE", "false",
        ])
        ds = FakeDataset(n, sizes=sizes)
        batches = [
            [m["item_id"] for m in meta]
            for _, _, meta in make_loader(cfg, ds, gb=2)
        ]
        # identity permutation 0..15 alternates L,P: batch-local grouping
        # emits [0,2] then [1,3] then [4,6] ... -- the first FOUR batches all
        # come from the first half of the stream
        early = {i for b in batches[:4] for i in b}
        assert max(early) < n // 2 + 2, batches


class TestSubsample:
    def test_two_stream_partition(self):
        batch, _ = make_batch_and_targets(b=1, t=8, dur=7)
        meta = [{"frame_ids": list(range(100, 107)), "item_id": 0,
                 "ori_size": (32, 32), "qtype": "none"}]
        b1, m1 = subsample_batch(batch, meta, 0)
        b2, m2 = subsample_batch(batch, meta, 1)
        assert b1.frames.shape[1] == 4 and b2.frames.shape[1] == 4
        assert int(b1.frame_valid.sum()) == 4  # frames 0,2,4,6 of dur 7
        assert int(b2.frame_valid.sum()) == 3  # frames 1,3,5
        assert m1[0]["frame_ids"] == [100, 102, 104, 106]
        assert m2[0]["frame_ids"] == [101, 103, 105]
        # together they cover every original frame exactly once
        assert sorted(m1[0]["frame_ids"] + m2[0]["frame_ids"]) == list(range(100, 107))


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write(10, {"loss": 1.5, "lr": 1e-4})
    w.write(20, {"loss": 1.2, "lr": 1e-4})
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [l["step"] for l in lines] == [10, 20]
    assert lines[1]["loss"] == 1.2


def test_epoch_indices_cached_per_epoch():
    """_epoch_indices does O(N) work once per epoch, not once per iteration."""
    cfg = tiny_cfg(["TPU.FRAME_BUCKETS", "[4]", "SOLVER.MAX_EPOCH", 2])
    ds = FakeDataset(10)
    loader = make_loader(cfg, ds)
    calls = {"n": 0}
    orig = np.random.default_rng

    def counting_rng(seed=None):
        calls["n"] += 1
        return orig(seed)

    np.random.default_rng = counting_rng
    try:
        first = loader._epoch_indices(0)
        again = loader._epoch_indices(0)
        other = loader._epoch_indices(1)
        back = loader._epoch_indices(0)
    finally:
        np.random.default_rng = orig
    np.testing.assert_array_equal(first, again)
    assert calls["n"] == 3  # epoch 0, epoch 1, epoch 0 again (cache size 1)
    assert not np.array_equal(first, other)
    np.testing.assert_array_equal(first, back)
