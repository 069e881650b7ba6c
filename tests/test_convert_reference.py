"""Reference-checkpoint converter: build a reference-shaped state_dict
synthetically, convert, and run our model with the result."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from stcat_tpu.models import STCATNet
from stcat_tpu.train.convert_reference import (
    convert_reference_stcat,
    merge_partial,
    remap_mdetr,
)
from helpers import make_batch_and_targets, tiny_cfg


def ref_state_dict(cfg, rng):
    """Synthesize a state_dict with the reference's exact key layout."""
    sd = {}
    d = cfg.MODEL.STCAT.HIDDEN
    heads = cfg.MODEL.STCAT.HEADS
    ffn = cfg.MODEL.STCAT.FFN_DIM

    def lin(name, din, dout):
        sd[name + ".weight"] = rng.randn(dout, din).astype(np.float32) * 0.02
        sd[name + ".bias"] = rng.randn(dout).astype(np.float32) * 0.02

    def ln(name, dd):
        sd[name + ".weight"] = np.ones(dd, np.float32)
        sd[name + ".bias"] = np.zeros(dd, np.float32)

    def mha(name, dd):
        sd[name + ".in_proj_weight"] = rng.randn(3 * dd, dd).astype(np.float32) * 0.02
        sd[name + ".in_proj_bias"] = np.zeros(3 * dd, np.float32)
        lin(name + ".out_proj", dd, dd)

    def mlp(name, dims):
        for j, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            lin(f"{name}.layers.{j}", a, b)

    # vision backbone (torchvision names under vis_encoder.0.body.)
    def bn(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)
        sd[name + ".running_mean"] = np.zeros(c, np.float32)
        sd[name + ".running_var"] = np.ones(c, np.float32)

    vp = "vis_encoder.0.body."
    sd[vp + "conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32) * 0.02
    bn(vp + "bn1", 64)
    inplanes = 64
    for li, depth in enumerate(cfg.MODEL.VISION_BACKBONE.DEPTHS):
        planes = 64 * 2**li
        for bi in range(depth):
            p = f"{vp}layer{li+1}.{bi}"
            sd[p + ".conv1.weight"] = rng.randn(planes, inplanes, 1, 1).astype(np.float32) * 0.02
            bn(p + ".bn1", planes)
            sd[p + ".conv2.weight"] = rng.randn(planes, planes, 3, 3).astype(np.float32) * 0.02
            bn(p + ".bn2", planes)
            sd[p + ".conv3.weight"] = rng.randn(planes * 4, planes, 1, 1).astype(np.float32) * 0.02
            bn(p + ".bn3", planes * 4)
            if bi == 0:
                sd[p + ".downsample.0.weight"] = rng.randn(planes * 4, inplanes, 1, 1).astype(np.float32) * 0.02
                bn(p + ".downsample.1", planes * 4)
            inplanes = planes * 4

    # input proj
    sd["input_proj.weight"] = rng.randn(d, 2048, 1, 1).astype(np.float32) * 0.02
    sd["input_proj.bias"] = np.zeros(d, np.float32)

    # text encoder: HF roberta layout under text_encoder.body.
    tm = cfg.MODEL.TEXT_MODEL
    tp = "text_encoder.body."
    sd[tp + "embeddings.word_embeddings.weight"] = rng.randn(tm.VOCAB_SIZE, tm.HIDDEN).astype(np.float32) * 0.02
    sd[tp + "embeddings.position_embeddings.weight"] = rng.randn(tm.MAX_POS, tm.HIDDEN).astype(np.float32) * 0.02
    sd[tp + "embeddings.token_type_embeddings.weight"] = rng.randn(1, tm.HIDDEN).astype(np.float32) * 0.02
    ln(tp + "embeddings.LayerNorm", tm.HIDDEN)
    for i in range(tm.LAYERS):
        lp = f"{tp}encoder.layer.{i}."
        lin(lp + "attention.self.query", tm.HIDDEN, tm.HIDDEN)
        lin(lp + "attention.self.key", tm.HIDDEN, tm.HIDDEN)
        lin(lp + "attention.self.value", tm.HIDDEN, tm.HIDDEN)
        lin(lp + "attention.output.dense", tm.HIDDEN, tm.HIDDEN)
        ln(lp + "attention.output.LayerNorm", tm.HIDDEN)
        lin(lp + "intermediate.dense", tm.HIDDEN, tm.INTERMEDIATE)
        lin(lp + "output.dense", tm.INTERMEDIATE, tm.HIDDEN)
        ln(lp + "output.LayerNorm", tm.HIDDEN)
    lin(tp + "pooler.dense", tm.HIDDEN, tm.HIDDEN)
    lin("text_encoder.resizer.fc", tm.HIDDEN, d)
    ln("text_encoder.resizer.layer_norm", d)

    # ground encoder
    for i in range(cfg.MODEL.STCAT.ENC_LAYERS):
        for kind in ("spatial_layers", "temporal_layers"):
            p = f"ground_encoder.encoder.{kind}.{i}"
            mha(p + ".self_attn", d)
            lin(p + ".linear1", d, ffn)
            lin(p + ".linear2", ffn, d)
            ln(p + ".norm1", d)
            ln(p + ".norm2", d)
    for tok in ("frame_cls", "video_cls", "local_pos_embed"):
        sd[f"ground_encoder.encoder.{tok}.weight"] = rng.randn(1, d).astype(np.float32) * 0.02
    lin("ground_encoder.fusion", d, d)  # dead code in ref

    # template generator
    for name in ("content_proj", "gamma_proj", "beta_proj"):
        lin(f"ground_decoder.template_generator.{name}", d, d)
    lin("ground_decoder.template_generator.anchor_proj", d, 4)

    # spatial decoder
    mlp("ground_decoder.decoder.query_scale", [d, d, d])
    mlp("ground_decoder.decoder.ref_point_head", [2 * d, d, d])
    ln("ground_decoder.decoder.norm", d)
    for i in range(cfg.MODEL.STCAT.DEC_LAYERS):
        p = f"ground_decoder.decoder.layers.{i}"
        mha(p + ".self_attn", d)
        for proj in ("sa_qcontent_proj", "sa_qpos_proj", "sa_qtime_proj",
                     "sa_kcontent_proj", "sa_kpos_proj", "sa_ktime_proj",
                     "sa_v_proj", "ca_qcontent_proj", "ca_kcontent_proj",
                     "ca_kpos_proj", "ca_v_proj", "ca_qpos_sine_proj"):
            lin(f"{p}.{proj}", d, d)
        if i == 0:
            lin(f"{p}.ca_qpos_proj", d, d)
        lin(p + ".cross_attn.out_proj", d, d)
        lin(p + ".linear1", d, ffn)
        lin(p + ".linear2", ffn, d)
        ln(p + ".norm1", d)
        ln(p + ".norm3", d)
        ln(p + ".norm4", d)

    # time decoder
    ln("ground_decoder.temp_decoder.norm", d)
    for i in range(cfg.MODEL.STCAT.DEC_LAYERS):
        p = f"ground_decoder.temp_decoder.layers.{i}"
        mha(p + ".self_attn", d)
        mha(p + ".cross_attn_image", d)
        lin(p + ".linear1", d, ffn)
        lin(p + ".linear2", ffn, d)
        ln(p + ".norm1", d)
        ln(p + ".norm3", d)
        ln(p + ".norm4", d)

    # heads
    mlp("bbox_embed", [d, d, d, 4])
    mlp("temp_embed", [d, d, 2])
    mlp("action_embed", [d, d, 1])
    return sd


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_full_reference_conversion_runs():
    cfg = tiny_cfg()
    sd = ref_state_dict(cfg, np.random.RandomState(0))
    params, constants, unused = convert_reference_stcat(sd, cfg)
    assert unused == set(), f"unconverted reference keys: {sorted(unused)[:10]}"

    model = STCATNet(cfg)
    batch, _ = make_batch_and_targets(b=1, t=4, h=32, w=32)
    init_vars = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch))
    # converted tree must slot into the model's expected structure exactly
    assert (
        jax.tree_util.tree_structure(init_vars["params"])
        == jax.tree_util.tree_structure(params)
    ), "converted param tree differs from model tree"
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(init_vars["params"])[0],
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        assert a.shape == np.asarray(b).shape, (pa, a.shape, np.asarray(b).shape)

    out = model.apply({"params": params, "constants": constants}, batch)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_mdetr_remap_prefixes():
    md = {
        "backbone.0.body.conv1.weight": 1,
        "transformer.text_encoder.pooler.dense.weight": 2,
        "transformer.resizer.fc.weight": 3,
        "transformer.encoder.layers.0.self_attn.in_proj_weight": 4,
        "transformer.decoder.layers.0.self_attn.in_proj_weight": 5,
        "input_proj.weight": 6,
        "bbox_embed.layers.0.weight": 7,
        "transformer.unrelated.thing": 8,
    }
    out = remap_mdetr(md)
    assert out["vis_encoder.0.body.conv1.weight"] == 1
    assert out["text_encoder.body.pooler.dense.weight"] == 2
    assert out["text_encoder.resizer.fc.weight"] == 3
    assert out["ground_encoder.encoder.spatial_layers.0.self_attn.in_proj_weight"] == 4
    assert out["ground_decoder.decoder.layers.0.self_attn.in_proj_weight"] == 5
    assert out["input_proj.weight"] == 6
    assert "transformer.unrelated.thing" not in out


def test_merge_partial():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    out = merge_partial(base, {"a": {"y": 20}})
    assert out == {"a": {"x": 1, "y": 20}, "b": 3}
    assert base["a"]["y"] == 2  # base untouched
