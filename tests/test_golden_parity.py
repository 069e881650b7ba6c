"""Golden parity vs torch (SURVEY.md §4 layer 2): converted weights must make
our modules reproduce torch reference numerics on CPU fp32.

Covers: torch.nn.MultiheadAttention <-> models.attention.MultiHeadAttention,
HF RobertaModel <-> models.roberta.Roberta (via checkpoint converters),
torch Conv2d padding semantics <-> flax explicit-padding conv, frozen-BN fold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from stcat_tpu.models.attention import MultiHeadAttention
from stcat_tpu.models.roberta import Roberta, RobertaConfig
from stcat_tpu.train.checkpoint import (
    _fold_bn,
    convert_hf_roberta,
    convert_torch_mha,
    convert_torch_resnet,
)


def test_mha_parity_with_torch():
    d, h, b, lq, lk = 32, 4, 2, 5, 7
    tm = torch.nn.MultiheadAttention(d, h, dropout=0.0)
    tm.eval()
    rng = np.random.RandomState(0)
    q = rng.randn(lq, b, d).astype(np.float32)
    k = rng.randn(lk, b, d).astype(np.float32)
    v = rng.randn(lk, b, d).astype(np.float32)
    pad = np.zeros((b, lk), bool)
    pad[0, -2:] = True  # torch: True = IGNORE

    with torch.no_grad():
        t_out, t_w = tm(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            key_padding_mask=torch.from_numpy(pad),
        )

    params = convert_torch_mha(tm.state_dict())
    ours = MultiHeadAttention(d_model=d, num_heads=h)
    j_out, j_w = ours.apply(
        {"params": params},
        jnp.asarray(q.transpose(1, 0, 2)),
        jnp.asarray(k.transpose(1, 0, 2)),
        jnp.asarray(v.transpose(1, 0, 2)),
        key_valid=jnp.asarray(~pad),
        return_weights=True,
    )
    np.testing.assert_allclose(
        np.asarray(j_out), t_out.numpy().transpose(1, 0, 2), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(j_w), t_w.numpy(), atol=2e-5)


def test_roberta_parity_with_hf():
    from transformers import RobertaConfig as HFConfig
    from transformers import RobertaModel

    hf_cfg = HFConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu", layer_norm_eps=1e-5,
    )
    hf = RobertaModel(hf_cfg)
    hf.eval()

    ids = np.asarray([[0, 9, 17, 33, 2, 1, 1, 1]], np.int64)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        out = hf(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))

    params = convert_hf_roberta(hf.state_dict(), num_layers=2)
    ours = Roberta(
        RobertaConfig(
            vocab_size=120, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=64,
        )
    )
    hidden, pooled = ours.apply(
        {"params": params}, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask.astype(bool))
    )
    # valid positions must match; padded positions differ (HF computes them)
    np.testing.assert_allclose(
        np.asarray(hidden)[0, :5], out.last_hidden_state.numpy()[0, :5], atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(pooled)[0], out.pooler_output.numpy()[0], atol=3e-5
    )


def test_conv_padding_parity_with_torch():
    """Stem conv: 7x7/2 pad 3 must align spatially with torch."""
    tc = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    x = np.random.RandomState(0).randn(1, 3, 33, 47).astype(np.float32)
    with torch.no_grad():
        t_out = tc(torch.from_numpy(x)).numpy()

    import flax.linen as nn

    conv = nn.Conv(8, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False)
    kernel = tc.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
    j_out = conv.apply(
        {"params": {"kernel": jnp.asarray(kernel)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out, atol=1e-4
    )


def test_frozen_bn_fold():
    sd = {
        "bn.weight": np.asarray([2.0, 1.0]),
        "bn.bias": np.asarray([1.0, -1.0]),
        "bn.running_mean": np.asarray([0.5, 2.0]),
        "bn.running_var": np.asarray([4.0, 1.0]),
    }
    scale, bias = _fold_bn(sd, "bn.")
    x = np.asarray([3.0, 3.0])
    # reference forward: w * (x - mean) / sqrt(var + eps) + b
    expected = sd["bn.weight"] * (x - sd["bn.running_mean"]) / np.sqrt(
        sd["bn.running_var"] + 1e-5
    ) + sd["bn.bias"]
    np.testing.assert_allclose(x * scale + bias, expected, atol=1e-5)


def test_resnet_converter_on_synthetic_state_dict():
    """Shape/naming coverage of the torchvision-layout converter."""
    rng = np.random.RandomState(0)
    depths = (1, 1, 1, 1)
    sd = {"conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32)}

    def add_bn(prefix, c):
        sd[prefix + "weight"] = np.ones(c, np.float32)
        sd[prefix + "bias"] = np.zeros(c, np.float32)
        sd[prefix + "running_mean"] = np.zeros(c, np.float32)
        sd[prefix + "running_var"] = np.ones(c, np.float32)

    add_bn("bn1.", 64)
    inplanes = 64
    for li, depth in enumerate(depths):
        planes = 64 * 2**li
        for bi in range(depth):
            p = f"layer{li+1}.{bi}."
            sd[p + "conv1.weight"] = rng.randn(planes, inplanes, 1, 1).astype(np.float32)
            add_bn(p + "bn1.", planes)
            sd[p + "conv2.weight"] = rng.randn(planes, planes, 3, 3).astype(np.float32)
            add_bn(p + "bn2.", planes)
            sd[p + "conv3.weight"] = rng.randn(planes * 4, planes, 1, 1).astype(np.float32)
            add_bn(p + "bn3.", planes * 4)
            if bi == 0:
                sd[p + "downsample.0.weight"] = rng.randn(planes * 4, inplanes, 1, 1).astype(np.float32)
                add_bn(p + "downsample.1.", planes * 4)
            inplanes = planes * 4

    params, constants = convert_torch_resnet(sd, depths)
    # must initialize and run our ResNet with exactly these trees
    from stcat_tpu.models.resnet import ResNet

    net = ResNet(depths=depths)
    x = jnp.zeros((1, 64, 64, 3))
    ref_vars = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x))
    # same tree structure
    assert jax.tree_util.tree_structure(ref_vars["params"]) == jax.tree_util.tree_structure(params)
    out = net.apply({"params": params, "constants": constants}, x)
    assert out.shape == (1, 2, 2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_projection_free_attention_parity_with_reference():
    """The reference's forked no-projection MHA (qk=2d, v=d, contiguous
    512-dim head split, max-subtracted softmax, head-averaged weights) vs
    our ProjectionFreeAttention with converted out_proj weights.
    ref models/grounding_model/attention.py:60-393."""
    import ref_harness

    ref_harness.install_stubs()
    from models.grounding_model.attention import MultiheadAttention as RefPFA

    from stcat_tpu.models.attention import ProjectionFreeAttention
    from stcat_tpu.train.checkpoint import _dense, _t

    d, h, lq, lk, b = 64, 4, 5, 9, 2
    torch.manual_seed(1)
    ref = RefPFA(2 * d, h, dropout=0.0, vdim=d).eval()

    rng = np.random.RandomState(0)
    q = rng.randn(lq, b, 2 * d).astype(np.float32)
    k = rng.randn(lk, b, 2 * d).astype(np.float32)
    v = rng.randn(lk, b, d).astype(np.float32)
    pad = np.zeros((b, lk), bool)
    pad[:, lk - 2:] = True  # torch: True = MASKED

    with torch.no_grad():
        ref_out, ref_w = ref(
            torch.tensor(q), torch.tensor(k), torch.tensor(v),
            key_padding_mask=torch.tensor(pad),
        )

    ours = ProjectionFreeAttention(qk_dim=2 * d, v_dim=d, num_heads=h)
    params = {
        "out_proj": {
            "kernel": _dense(ref.out_proj.weight),
            "bias": _t(ref.out_proj.bias),
        }
    }
    out, w = ours.apply(
        {"params": params},
        jnp.asarray(q.transpose(1, 0, 2)),  # ours is batch-first
        jnp.asarray(k.transpose(1, 0, 2)),
        jnp.asarray(v.transpose(1, 0, 2)),
        key_valid=jnp.asarray(~pad),
        return_weights=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy().transpose(1, 0, 2), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), atol=2e-5)


def test_template_generator_parity_with_reference():
    """FiLM-style template generator: gamma/beta modulation of frames_cls by
    videos_cls. ref query_decoder.py:441-475 (ragged loop -> batched here)."""
    import ref_harness

    ref_harness.install_stubs()
    from models.grounding_model.query_decoder import TemplateGenerator as RefTG

    from stcat_tpu.models.decoder import TemplateGenerator
    from stcat_tpu.train.convert_reference import convert_reference_stcat  # noqa: F401
    from stcat_tpu.train.checkpoint import _dense, _t

    d, b, t = 32, 2, 6
    cfg = ref_harness.make_ref_cfg(hidden=d)
    torch.manual_seed(2)
    ref = RefTG(cfg).eval()

    rng = np.random.RandomState(3)
    frames_cls = rng.randn(b * t, d).astype(np.float32)  # ref: ragged concat
    videos_cls = rng.randn(b, d).astype(np.float32)
    with torch.no_grad():
        ref_anchor, ref_content = ref(
            frames_cls=torch.tensor(frames_cls),
            videos_cls=torch.tensor(videos_cls),
            durations=[t, t],
        )

    ours = TemplateGenerator(d_model=d, query_dim=4)
    params = {
        name: {"kernel": _dense(getattr(ref, name).weight),
               "bias": _t(getattr(ref, name).bias)}
        for name in ("content_proj", "gamma_proj", "beta_proj", "anchor_proj")
    }
    anchor_logits, content = ours.apply(
        {"params": params},
        jnp.asarray(frames_cls.reshape(b, t, d)),
        jnp.asarray(videos_cls),
    )
    np.testing.assert_allclose(
        np.asarray(anchor_logits).reshape(b * t, 4), ref_anchor.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(content).reshape(b * t, d), ref_content.numpy(), atol=1e-5
    )


def test_resnet_gn_variant_parity_with_torchvision():
    """GroupNorm backbone variant (ref backbone.py:124-145 GroupNormBackbone:
    torchvision ResNet with norm_layer=GroupNorm(32)): a tiny-depth torch
    model with torchvision's exact structure/naming converts via
    convert_torch_resnet(norm="gn") and our ResNet(norm="gn") reproduces its
    layer4 features. (torchvision itself is not in this image; the module
    below replicates torchvision.models.resnet.ResNet(Bottleneck,...) layout
    and state_dict names exactly.)"""
    nn_t = torch.nn

    def gn32(c):
        return nn_t.GroupNorm(32, c)

    class TVBottleneck(nn_t.Module):
        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn_t.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = gn32(planes)
            self.conv2 = nn_t.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = gn32(planes)
            self.conv3 = nn_t.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = gn32(planes * 4)
            self.relu = nn_t.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class TVResNet(nn_t.Module):
        def __init__(self, layers):
            super().__init__()
            self.conv1 = nn_t.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = gn32(64)
            self.relu = nn_t.ReLU(inplace=True)
            self.maxpool = nn_t.MaxPool2d(3, 2, 1)
            self.inplanes = 64
            for i, (planes, stride) in enumerate(
                zip((64, 128, 256, 512), (1, 2, 2, 2))
            ):
                blocks = []
                for j in range(layers[i]):
                    s = stride if j == 0 else 1
                    ds = None
                    if j == 0:
                        ds = nn_t.Sequential(
                            nn_t.Conv2d(self.inplanes, planes * 4, 1, s, bias=False),
                            gn32(planes * 4),
                        )
                    blocks.append(TVBottleneck(self.inplanes, planes, s, ds))
                    self.inplanes = planes * 4
                setattr(self, f"layer{i + 1}", nn_t.Sequential(*blocks))

    torch.manual_seed(0)
    tv = TVResNet([1, 1, 1, 1]).eval()
    # non-trivial affines (default GN init is scale=1, bias=0)
    with torch.no_grad():
        for name, p in tv.named_parameters():
            if "bn" in name or "downsample.1" in name:
                p.add_(torch.randn_like(p) * 0.1)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        t = tv.maxpool(tv.relu(tv.bn1(tv.conv1(t))))
        t = tv.layer4(tv.layer3(tv.layer2(tv.layer1(t))))
    ref_out = t.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    params, constants = convert_torch_resnet(
        tv.state_dict(), (1, 1, 1, 1), norm="gn"
    )
    assert constants == {}  # GN has nothing to fold

    from stcat_tpu.models.resnet import ResNet

    net = ResNet(depths=(1, 1, 1, 1), norm="gn")
    ref_vars = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 96, 3)))
    )
    assert jax.tree_util.tree_structure(ref_vars["params"]) == \
        jax.tree_util.tree_structure(params)
    out = net.apply(
        {"params": params, "constants": {}}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4)
