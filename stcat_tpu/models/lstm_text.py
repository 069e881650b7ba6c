"""GloVe + bi-LSTM text encoder (the MODEL.USE_LSTM alternative path).

ref models/language_model/lstm.py:9-85 (RNNEncoder): embedding (GloVe,
optionally frozen) -> (bi)LSTM -> per-token hidden states + final state as
the sentence CLS. Not used by either published recipe, but config-reachable;
kept for capability parity. GloVe vectors load from a local .npy when
available; otherwise the embedding trains from scratch.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class LSTMTextEncoder(nn.Module):
    vocab_size: int
    d_model: int
    hidden_size: int = 512
    embed_dim: int = 300          # GloVe dimensionality
    num_layers: int = 2
    bidirectional: bool = True
    glove_path: str = ""          # local .npy [vocab, 300]; init-time only

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray, token_valid: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (token_feats [B, L, d_model], cls [B, d_model])."""

        def _embed_init(key, shape, dtype=jnp.float32):
            # runs only at module init, never inside apply/jit
            table = load_glove_embedding(self.glove_path, shape[0], shape[1])
            if table is None:
                return nn.initializers.variance_scaling(
                    1.0, "fan_in", "normal", out_axis=0
                )(key, shape, dtype)
            return jnp.asarray(table, dtype)

        emb = nn.Embed(
            self.vocab_size, self.embed_dim,
            embedding_init=_embed_init, name="embedding",
        )(token_ids)
        lengths = token_valid.sum(axis=1)

        h = emb
        per_dir = self.hidden_size // (2 if self.bidirectional else 1)
        for layer in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(per_dir), name=f"fwd_{layer}")(
                h, seq_lengths=lengths
            )
            if self.bidirectional:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(per_dir), reverse=True,
                    keep_order=True, name=f"bwd_{layer}",
                )(h, seq_lengths=lengths)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd

        proj = nn.Dense(self.d_model, name="proj")
        feats = proj(h)
        # sentence embedding: last valid forward state (masked gather)
        idx = jnp.maximum(lengths - 1, 0)
        last = jnp.take_along_axis(h, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        cls = proj(last)
        return feats, cls


def load_glove_embedding(path: str, vocab_size: int, embed_dim: int = 300):
    """Load a [vocab, 300] GloVe matrix from a local .npy; None if absent."""
    import os

    import numpy as np

    if not path or not os.path.exists(path):
        return None
    table = np.load(path)
    assert table.shape == (vocab_size, embed_dim), table.shape
    return table
