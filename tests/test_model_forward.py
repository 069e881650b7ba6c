"""Forward-shape and sanity tests for the model stack on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stcat_tpu.config import default_config, merge_from_list
from stcat_tpu.core.batch import VideoBatch
from stcat_tpu.models import STCATNet, build_resnet, downsample_mask
from stcat_tpu.models.roberta import RobertaConfig, TextEncoder


def tiny_cfg():
    return merge_from_list(
        default_config(),
        [
            "MODEL.VISION_BACKBONE.NAME", "resnet50",
            "MODEL.VISION_BACKBONE.DEPTHS", "[1,1,1,1]",
            "MODEL.STCAT.ENC_LAYERS", 2,
            "MODEL.STCAT.DEC_LAYERS", 2,
            "MODEL.STCAT.HIDDEN", 64,
            "MODEL.STCAT.HEADS", 4,
            "MODEL.STCAT.FFN_DIM", 128,
            "INPUT.MAX_VIDEO_LEN", 32,
            "MODEL.TEXT_MODEL.VOCAB_SIZE", 128,
            "MODEL.TEXT_MODEL.HIDDEN", 32,
            "MODEL.TEXT_MODEL.LAYERS", 2,
            "MODEL.TEXT_MODEL.HEADS", 2,
            "MODEL.TEXT_MODEL.INTERMEDIATE", 64,
            "MODEL.TEXT_MODEL.MAX_POS", 64,
            "TPU.COMPUTE_DTYPE", "float32",
            "TPU.REMAT_BACKBONE", "false",
        ],
    )


def tiny_roberta():
    return RobertaConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
    )


def make_batch(b=1, t=4, h=64, w=64, l=6, seed=0):
    rng = np.random.RandomState(seed)
    frame_valid = np.ones((b, t), bool)
    if t > 2:
        frame_valid[:, -1] = False  # one padded frame
    return VideoBatch(
        frames=jnp.asarray(rng.randn(b, t, h, w, 3).astype(np.float32)),
        frame_valid=jnp.asarray(frame_valid),
        pixel_valid=jnp.ones((b, t, h, w), bool),
        token_ids=jnp.asarray(rng.randint(3, 100, size=(b, l)), jnp.int32),
        token_valid=jnp.asarray(np.arange(l)[None] < l - 1).repeat(b, 0),
    )


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = STCATNet(cfg)
    # patch in a tiny roberta for test speed
    object.__setattr__(model, "_tiny", True)
    batch = make_batch()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    return model, params, batch


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_resnet_output_shape():
    net, dim = build_resnet("resnet50", dc5=False)
    x = jnp.zeros((2, 64, 64, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (2, 2, 2, 2048)
    # stride 32, torch-compatible: 64 -> 2


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_resnet_dc5_keeps_stride16():
    net, _ = build_resnet("resnet50", dc5=True)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (1, 4, 4, 2048)


def test_downsample_mask_nearest():
    m = np.zeros((1, 8, 8), bool)
    m[0, :4, :4] = True
    out = np.asarray(downsample_mask(jnp.asarray(m), (2, 2)))
    assert out.shape == (1, 2, 2)
    assert out[0, 0, 0] and not out[0, 1, 1]


def test_text_encoder_shapes():
    enc = TextEncoder(d_model=32, cfg=tiny_roberta())
    ids = jnp.ones((2, 10), jnp.int32)
    valid = jnp.ones((2, 10), bool)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), ids, valid)
    feats, cls = enc.apply(params, ids, valid)
    assert feats.shape == (2, 10, 32)
    assert cls.shape == (2, 32)


def test_text_padding_invariance():
    """Padded tokens must not change valid-token outputs."""
    enc = TextEncoder(d_model=32, cfg=tiny_roberta())
    ids = np.ones((1, 8), np.int32) * 5
    valid = np.zeros((1, 8), bool)
    valid[0, :5] = True
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(valid))
    f1, _ = enc.apply(params, jnp.asarray(ids), jnp.asarray(valid))
    ids2 = ids.copy()
    ids2[0, 5:] = 77  # change padded token ids
    f2, _ = enc.apply(params, jnp.asarray(ids2), jnp.asarray(valid))
    np.testing.assert_allclose(
        np.asarray(f1)[0, :5], np.asarray(f2)[0, :5], atol=1e-5
    )


class TestSTCATForward:
    def test_output_contract(self, model_and_params):
        model, params, batch = model_and_params
        out = model.apply(params, batch)
        b, t = batch.frame_valid.shape
        assert out["pred_boxes"].shape == (b, t, 4)
        assert out["pred_sted"].shape == (b, t, 2)
        assert out["pred_actioness"].shape == (b, t, 1)
        assert out["weights"].shape == (b, t, t)
        assert len(out["aux_outputs"]) == 1  # DEC_LAYERS - 1
        for a in out["aux_outputs"]:
            assert set(a) == {"pred_boxes", "pred_sted", "weights", "pred_actioness"}
        # boxes in (0,1) via sigmoid
        boxes = np.asarray(out["pred_boxes"])
        assert (boxes >= 0).all() and (boxes <= 1).all()
        assert np.isfinite(np.asarray(out["pred_sted"])).all()

    @pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
    def test_jit_and_second_t_bucket(self, model_and_params):
        model, params, _ = model_and_params
        fwd = jax.jit(lambda p, b: model.apply(p, b))
        out4 = fwd(params, make_batch(t=4))
        out8 = fwd(params, make_batch(t=8))
        assert out4["pred_boxes"].shape[1] == 4
        assert out8["pred_boxes"].shape[1] == 8

    def test_attention_weights_rows_sum_to_one(self, model_and_params):
        model, params, batch = model_and_params
        out = model.apply(params, batch)
        w = np.asarray(out["weights"])
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
        # padded frame gets ~zero attention as a key
        assert w[0, 0, -1] < 1e-6
