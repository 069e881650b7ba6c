"""Config-reachable model variants: POS_ENC kinds, LSTM text path, DC5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stcat_tpu.models import STCATNet
from stcat_tpu.models.position2d import (
    LearnedPositionEmbedding2D,
    sine_position_embedding_2d_hw,
)
from stcat_tpu.models.lstm_text import LSTMTextEncoder
from helpers import make_batch_and_targets, tiny_cfg


def test_sine_hw_embedding_shape():
    mask = jnp.ones((2, 5, 7), bool)
    pe = np.asarray(sine_position_embedding_2d_hw(mask, num_pos_feats=4))
    assert pe.shape == (2, 5, 7, 8)
    assert np.isfinite(pe).all()


def test_learned_embedding_shape():
    mod = LearnedPositionEmbedding2D(num_pos_feats=4)
    mask = jnp.ones((1, 3, 6, 7), bool)
    params = mod.init(jax.random.PRNGKey(0), mask)
    pe = mod.apply(params, mask)
    assert pe.shape == (1, 3, 6, 7, 8)


def test_lstm_text_encoder():
    enc = LSTMTextEncoder(vocab_size=50, d_model=16, hidden_size=8,
                          embed_dim=12, num_layers=1)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 50, (2, 9)), jnp.int32)
    valid = jnp.asarray(np.arange(9)[None] < np.asarray([[5], [9]]))
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), ids, valid)
    feats, cls = enc.apply(params, ids, valid)
    assert feats.shape == (2, 9, 16)
    assert cls.shape == (2, 16)
    assert np.isfinite(np.asarray(feats)).all()


@pytest.mark.parametrize("variant", [
    ["MODEL.VISION_BACKBONE.POS_ENC", "sineHW"],
    ["MODEL.VISION_BACKBONE.POS_ENC", "learned"],
    ["MODEL.USE_LSTM", "true", "MODEL.LSTM.HIDDEN_SIZE", 16,
     "MODEL.LSTM.EMBED_DIM", 12, "MODEL.LSTM.NUM_LAYERS", 1],
])
@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_model_variant_forward(variant):
    cfg = tiny_cfg(variant)
    model = STCATNet(cfg)
    batch, _ = make_batch_and_targets(b=1, t=4, h=32, w=32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    assert out["pred_boxes"].shape == (1, 4, 4)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_lstm_glove_init(tmp_path):
    """GloVe table from a local .npy becomes the embedding init verbatim."""
    import os

    table = np.random.RandomState(0).randn(50, 12).astype(np.float32)
    path = os.path.join(str(tmp_path), "glove.npy")
    np.save(path, table)
    enc = LSTMTextEncoder(vocab_size=50, d_model=16, hidden_size=8,
                          embed_dim=12, num_layers=1, glove_path=path)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 50, (2, 6)), jnp.int32)
    valid = jnp.ones((2, 6), bool)
    variables = enc.init(jax.random.PRNGKey(0), ids, valid)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["embedding"]["embedding"]), table
    )
    # absent path -> random init, still runs
    enc2 = LSTMTextEncoder(vocab_size=50, d_model=16, hidden_size=8,
                           embed_dim=12, num_layers=1, glove_path="/nope.npy")
    v2 = enc2.init(jax.random.PRNGKey(0), ids, valid)
    assert not np.allclose(np.asarray(v2["params"]["embedding"]["embedding"]), table)
