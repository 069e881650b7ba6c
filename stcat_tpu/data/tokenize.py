"""Host-side tokenization.

The reference tokenizes inside the model forward (models/language_model/
bert.py:59-61) -- a host sync in the middle of every step. Here tokenization
happens in the data workers and the jitted model only ever sees fixed-shape
[B, L] int32 ids.

Zero-egress environments: the HF tokenizer is only loaded from a LOCAL path
(MODEL.TEXT_MODEL.LOCAL_PATH or a pre-populated HF cache). When unavailable,
a deterministic hash tokenizer stands in -- sufficient for synthetic training,
tests and benchmarks; real-checkpoint parity requires the real vocab files.
"""

from __future__ import annotations

import os
from typing import List, Protocol, Tuple

import numpy as np


class Tokenizer(Protocol):
    def __call__(self, texts: List[str], max_len: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (ids [B, max_len] int32, valid [B, max_len] bool)."""


# RoBERTa special ids
BOS, PAD, EOS = 0, 1, 2


class HashTokenizer:
    """Deterministic whitespace+hash tokenizer with RoBERTa-style specials.

    <s> tokens </s> padded with <pad>; ids land in [special_offset, vocab).
    """

    def __init__(self, vocab_size: int = 50265, special_offset: int = 10):
        self.vocab_size = vocab_size
        self.special_offset = special_offset

    def _word_id(self, word: str) -> int:
        h = 2166136261
        for ch in word.encode():  # FNV-1a, stable across runs/processes
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        return self.special_offset + h % (self.vocab_size - self.special_offset)

    def __call__(self, texts: List[str], max_len: int):
        ids = np.full((len(texts), max_len), PAD, np.int32)
        valid = np.zeros((len(texts), max_len), bool)
        for i, text in enumerate(texts):
            words = text.lower().split()[: max_len - 2]
            row = [BOS] + [self._word_id(w) for w in words] + [EOS]
            ids[i, : len(row)] = row
            valid[i, : len(row)] = True
        return ids, valid


class HFTokenizer:
    """RobertaTokenizerFast wrapper (padding to fixed max_len)."""

    def __init__(self, path: str):
        from transformers import RobertaTokenizerFast

        self.tok = RobertaTokenizerFast.from_pretrained(path, local_files_only=True)

    def __call__(self, texts: List[str], max_len: int):
        enc = self.tok(
            texts,
            padding="max_length",
            truncation=True,
            max_length=max_len,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(bool)


def weights_are_reference_derived(weight: str) -> bool:
    """True when MODEL.WEIGHT points at weights whose token-embedding rows
    were trained against the REAL roberta-base vocabulary: a torch checkpoint
    (reference/MDETR .pth) or a framework checkpoint directory that
    cli/convert.py marked with a provenance file."""
    if not weight:
        return False
    if weight.endswith((".pth", ".pt", ".bin")):
        return True
    import json

    base = weight.rstrip("/")
    for d in (base, os.path.dirname(base)):
        marker = os.path.join(d, "provenance.json") if d else ""
        if marker and os.path.isfile(marker):
            try:
                with open(marker) as f:
                    return bool(json.load(f).get("converted_from_reference"))
            except (OSError, ValueError):
                return True  # unreadable marker: assume reference-derived
    return False


def check_tokenizer_for_weights(cfg, tokenizer, weight: str,
                                what: str = "evaluation") -> None:
    """Hard-fail guard: reference-derived weights + the HASH tokenizer will
    silently produce garbage metrics (the embedding rows were trained on the
    real BPE vocabulary). Raises unless MODEL.TEXT_MODEL.ALLOW_HASH_TOKENIZER
    explicitly opts in (synthetic pipelines keep working: fresh-init or
    own-trained checkpoints never trip this)."""
    if not isinstance(tokenizer, HashTokenizer):
        return
    if not weights_are_reference_derived(weight):
        return
    if cfg.MODEL.TEXT_MODEL.ALLOW_HASH_TOKENIZER:
        import logging

        logging.getLogger("stcat_tpu").warning(
            "ALLOW_HASH_TOKENIZER=true: running %s of reference-derived "
            "weights (%s) with the HASH tokenizer -- metrics will NOT match "
            "the reference.", what, weight)
        return
    raise RuntimeError(
        f"Refusing {what}: MODEL.WEIGHT={weight!r} is reference-derived, but "
        "no real roberta-base tokenizer files were found, so the stand-in "
        "HASH tokenizer is active. Its token ids do not match the vocabulary "
        "the weights were trained on; every metric would be garbage. Put "
        "vocab.json/merges.txt (or the full HF snapshot) under "
        "MODEL.TEXT_MODEL.LOCAL_PATH, or pass "
        "MODEL.TEXT_MODEL.ALLOW_HASH_TOKENIZER true to override knowingly."
    )


def build_tokenizer(cfg) -> Tokenizer:
    import logging

    log = logging.getLogger("stcat_tpu")
    path = cfg.MODEL.TEXT_MODEL.LOCAL_PATH or cfg.MODEL.TEXT_MODEL.NAME
    # only attempt HF when the files are local (hub calls hang with no egress)
    hf_home = os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    if os.path.isdir(path) or os.path.isdir(os.path.join(hf_home, "hub")):
        try:
            return HFTokenizer(path)
        except Exception as e:
            log.warning("HF tokenizer load failed from %r: %s", path, e)
    # LOUD: accuracy parity with reference checkpoints is impossible with the
    # stand-in (different token ids than the weights were trained on) -- see
    # README 'Real-asset layout' for where to place the roberta-base files
    log.warning(
        "=" * 72
        + "\nNo local tokenizer files for %r -- using the deterministic HASH "
        "tokenizer.\nThis is fine for synthetic training/tests/benchmarks, but "
        "real-checkpoint\nevaluation will NOT reproduce reference accuracy. Put "
        "the roberta-base\nvocab.json/merges.txt under MODEL.TEXT_MODEL.LOCAL_PATH."
        "\n" + "=" * 72,
        path,
    )
    return HashTokenizer(vocab_size=cfg.MODEL.TEXT_MODEL.VOCAB_SIZE)
