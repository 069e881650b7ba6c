"""Hash-tokenizer guard: reference-derived weights must not be evaluated
with the stand-in hash tokenizer (the token ids would not match the
vocabulary the embedding rows were trained on -- metrics would be garbage).

ref surface being protected: scripts/test_net.py loads released .pth
checkpoints whose text path is HF roberta-base (models/language_model/
bert.py:45-46); our zero-egress fallback (data/tokenize.py HashTokenizer)
is only valid for synthetic / own-trained weights.
"""

import json
import os

import pytest

from stcat_tpu.config import default_config, merge_from_list
from stcat_tpu.data.tokenize import (
    HashTokenizer,
    check_tokenizer_for_weights,
    weights_are_reference_derived,
)


def test_torch_weight_paths_are_reference_derived(tmp_path):
    assert weights_are_reference_derived("hcstvg_res448.pth")
    assert weights_are_reference_derived("/abs/model.pt")
    assert weights_are_reference_derived("mdetr.bin")
    assert not weights_are_reference_derived("")
    # plain orbax dir without a provenance marker: own-trained, allowed
    assert not weights_are_reference_derived(str(tmp_path))


def test_converted_dir_detected_via_provenance(tmp_path):
    out = tmp_path / "converted"
    out.mkdir()
    with open(out / "provenance.json", "w") as f:
        json.dump({"converted_from_reference": True, "src": "x.pth"}, f)
    assert weights_are_reference_derived(str(out))
    # load_weights_for_eval-style path pointing INSIDE the dir also matches
    assert weights_are_reference_derived(os.path.join(str(out), "checkpoints"))
    # an explicit false marker (e.g. future own-format provenance) passes
    with open(out / "provenance.json", "w") as f:
        json.dump({"converted_from_reference": False}, f)
    assert not weights_are_reference_derived(str(out))


def test_guard_raises_for_reference_weights_with_hash_tokenizer():
    cfg = default_config()
    tok = HashTokenizer()
    with pytest.raises(RuntimeError, match="HASH tokenizer"):
        check_tokenizer_for_weights(cfg, tok, "released_res448.pth")


def test_guard_override_flag_allows():
    cfg = merge_from_list(
        default_config(), ["MODEL.TEXT_MODEL.ALLOW_HASH_TOKENIZER", "true"]
    )
    check_tokenizer_for_weights(cfg, HashTokenizer(), "released_res448.pth")


def test_guard_passes_for_own_checkpoints_and_real_tokenizer(tmp_path):
    cfg = default_config()
    # own-trained orbax dir + hash tokenizer: fine (consistent vocabulary)
    check_tokenizer_for_weights(cfg, HashTokenizer(), str(tmp_path))
    # fresh init (no weights): fine
    check_tokenizer_for_weights(cfg, HashTokenizer(), "")

    # a real (non-hash) tokenizer never trips, even on .pth weights
    class FakeHF:
        def __call__(self, texts, max_len):
            raise NotImplementedError

    check_tokenizer_for_weights(cfg, FakeHF(), "released_res448.pth")


def test_cli_test_hard_fails_on_converted_checkpoint(tmp_path, monkeypatch):
    """End-to-end: cli.test over a synthetic dataset with a marked converted
    checkpoint dir must raise before any eval work happens."""
    import sys

    out = tmp_path / "converted"
    (out / "checkpoints").mkdir(parents=True)
    with open(out / "provenance.json", "w") as f:
        json.dump({"converted_from_reference": True, "src": "ref.pth"}, f)

    from tests.test_cli import TINY_OPTS

    from stcat_tpu.cli.test import main as test_main

    monkeypatch.setattr(
        sys, "argv",
        ["test", "--synthetic", "DATA_DIR", str(tmp_path / "data"),
         "OUTPUT_DIR", str(tmp_path / "out"), "MODEL.WEIGHT", str(out)]
        + TINY_OPTS,
    )
    with pytest.raises(RuntimeError, match="HASH tokenizer"):
        test_main()
