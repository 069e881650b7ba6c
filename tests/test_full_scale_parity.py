"""FULL-SIZE conversion + forward parity vs the PyTorch reference.

test_full_parity.py proves the numerics at tiny depths; this test builds the
reference at the PUBLISHED scale -- ResNet-101 (3,4,23,3) with layer3.0 ..
layer3.22, RoBERTa-base geometry (12 layers x 768, heads 12, FFN 3072,
max_pos 514, pooler at 768), STCAT 6 enc / 6 dec / FFN 2048 -- so per-layer
naming or shape bugs that only exist at real depth (e.g. a converter regex
that stops at layer3.9, or a pooler resize at 768) cannot hide. The token
EMBEDDING table is shrunk (vocab 2056) to keep CPU runtime sane; vocab size
is a row count, not a naming/depth risk.

Also exercises the MDETR pretrained-init remap (ref utils/checkpoint.py:
122-172) at full shape: a synthetic MDETR state_dict built by inverse-naming
the reference model's weights must remap + convert to EXACTLY the same
arrays as the direct conversion for the covered subtrees.
"""

import numpy as np
import pytest

import ref_harness

ref_harness.install_stubs()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stcat_tpu.config import default_config, merge_from_list  # noqa: E402
from stcat_tpu.core.batch import VideoBatch  # noqa: E402
from stcat_tpu.models import STCATNet  # noqa: E402
from stcat_tpu.train.convert_reference import (  # noqa: E402
    convert_reference_stcat,
    merge_partial,
    remap_mdetr,
)

T, H, W, L = 2, 64, 64, 7
VOCAB = 2056  # full-size everything except the embedding row count


def _full_cfg():
    return merge_from_list(default_config(), [
        "MODEL.VISION_BACKBONE.NAME", "resnet101",
        "MODEL.STCAT.DROPOUT", 0.0,
        "MODEL.TEXT_MODEL.VOCAB_SIZE", VOCAB,
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.REMAT_BACKBONE", "false",
        "TPU.ATTENTION_IMPL", "xla",
    ])


def _hf_full_config():
    import transformers

    return transformers.RobertaConfig(
        vocab_size=VOCAB, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514, type_vocab_size=1, pad_token_id=1,
    )


def _build_ref(monkeypatch):
    # reference resnet101 at its REAL stage depths
    monkeypatch.setitem(ref_harness.RESNET_LAYERS, "resnet101", (3, 4, 23, 3))
    rng = np.random.RandomState(7)
    ids = rng.randint(3, VOCAB, size=(1, L)).astype(np.int64)
    tokenizer = ref_harness.FakeTokenizer(ids, np.ones_like(ids))
    ref_harness.patch_text_encoder(monkeypatch, _hf_full_config(), tokenizer)

    from models.pipeline import STCATNet as RefSTCATNet

    torch.manual_seed(1)
    ref_cfg = ref_harness.make_ref_cfg(
        hidden=256, heads=8, enc_layers=6, dec_layers=6, ffn=2048,
        max_video_len=200, backbone="resnet101", from_scratch=True,
    )
    ref_model = RefSTCATNet(ref_cfg).eval()
    ref_harness.randomize_frozen_bn(ref_model)
    return ref_model, ids, rng


@pytest.mark.slow
def test_full_scale_conversion_and_forward(monkeypatch):
    ref_model, ids, rng = _build_ref(monkeypatch)
    sd = ref_model.state_dict()
    # the deep tail of layer3 must exist in the source...
    assert any(k.startswith("vis_encoder.0.body.layer3.22.") for k in sd)

    cfg = _full_cfg()
    model = STCATNet(cfg)
    params, constants, unused = convert_reference_stcat(sd, cfg)
    assert not unused, f"unconverted at full scale: {sorted(unused)[:10]}"

    # ...and in the converted tree, along with full-width text modules
    assert "layer3_22" in params["vis_encoder"], sorted(params["vis_encoder"])[:6]
    roberta = params["text_encoder"]["roberta"]
    assert roberta["word_embeddings"]["embedding"].shape == (VOCAB, 768)
    assert "layer_11" in roberta, sorted(roberta)[:6]
    assert roberta["pooler"]["kernel"].shape == (768, 768)
    assert params["text_encoder"]["resizer"]["fc"]["kernel"].shape == (768, 256)

    # converted tree must match the model's own init template EXACTLY
    frames = rng.randn(T, 3, H, W).astype(np.float32) * 0.4
    batch = VideoBatch(
        frames=jnp.asarray(frames.transpose(0, 2, 3, 1)[None]),
        frame_valid=jnp.ones((1, T), bool),
        pixel_valid=jnp.ones((1, T, H, W), bool),
        token_ids=jnp.asarray(ids, jnp.int32),
        token_valid=jnp.ones((1, L), bool),
    )
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch)

    def flat(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}"
            if isinstance(v, dict):
                out.update(flat(v, p))
            else:
                out[p] = tuple(v.shape)
        return out

    tpl, got = flat(template["params"]), flat(params)
    assert tpl == got, (
        f"missing: {sorted(set(tpl) - set(got))[:8]} "
        f"extra: {sorted(set(got) - set(tpl))[:8]} "
        f"shapes: {[(k, tpl[k], got[k]) for k in tpl if k in got and tpl[k] != got[k]][:8]}"
    )

    # forward parity at full scale
    from utils.misc import NestedTensor

    videos = NestedTensor(
        torch.tensor(frames), torch.zeros((T, H, W), dtype=torch.bool), [T]
    )
    with torch.no_grad():
        ref_out = ref_model(videos, ["a full scale parity clip"])
    ours = model.apply(
        {"params": params, "constants": constants}, batch, deterministic=True
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_boxes"]),
        ref_out["pred_boxes"].reshape(1, T, 4).numpy(),
        atol=5e-4, rtol=1e-3, err_msg="pred_boxes",
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_sted"]), ref_out["pred_sted"].numpy(),
        atol=5e-4, rtol=1e-3, err_msg="pred_sted",
    )


@pytest.mark.slow
def test_full_scale_mdetr_remap(monkeypatch):
    """Synthetic full-shape MDETR state_dict -> remap -> convert must equal
    the direct conversion on every covered subtree (ref checkpoint.py:122-172)."""
    ref_model, ids, rng = _build_ref(monkeypatch)
    sd = ref_model.state_dict()

    inverse = [
        ("vis_encoder.", "backbone."),
        ("text_encoder.body.", "transformer.text_encoder."),
        ("text_encoder.resizer.", "transformer.resizer."),
        ("ground_encoder.encoder.spatial_layers.", "transformer.encoder.layers."),
        ("ground_decoder.decoder.", "transformer.decoder."),
    ]
    mdetr_sd = {}
    for k, v in sd.items():
        for ours_p, mdetr_p in inverse:
            if k.startswith(ours_p):
                mdetr_sd[mdetr_p + k[len(ours_p):]] = v
                break
        else:
            if k.startswith(("input_proj.", "bbox_embed.")):
                mdetr_sd[k] = v
    assert any(k.startswith("transformer.encoder.layers.5.") for k in mdetr_sd)
    assert any(k.startswith("backbone.0.body.layer3.22.") for k in mdetr_sd)

    cfg = _full_cfg()
    remapped = remap_mdetr(mdetr_sd)
    partial, partial_consts, _ = convert_reference_stcat(
        remapped, cfg, strict=False
    )
    full, full_consts, unused = convert_reference_stcat(sd, cfg)
    assert not unused

    def compare(sub, ref, path=""):
        assert isinstance(sub, dict) == isinstance(ref, dict), path
        if isinstance(sub, dict):
            for k in sub:
                assert k in ref, f"{path}/{k} not in direct conversion"
                compare(sub[k], ref[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(sub), np.asarray(ref),
                                          err_msg=path)

    # every remapped subtree carries identical arrays to the direct convert
    for top in ("vis_encoder", "input_proj", "bbox_embed"):
        assert top in partial, sorted(partial)
        compare(partial[top], full[top], top)
    compare(partial["text_encoder"], full["text_encoder"], "text_encoder")
    compare(partial_consts, full_consts, "constants")
    # partial init merges over fresh params without structure damage
    merged = merge_partial(full, partial)
    compare(merged, full, "merged")
