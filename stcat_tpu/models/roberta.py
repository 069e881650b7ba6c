"""RoBERTa-base text encoder in flax (own implementation, HF-weight compatible).

Replaces the reference's in-forward HuggingFace RobertaModel call
(models/language_model/bert.py:42-74). Two TPU-first differences:
  - tokenization happens in the data layer (host-side), never inside the
    jitted step -- the model consumes fixed-shape [B, L] int32 token ids +
    masks, so the whole forward stays traceable;
  - attention is batched fixed-shape masked MHA in bf16-friendly form.

Weight layout is HF-compatible via the converter in train/checkpoint.py.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import MultiHeadAttention


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    dropout: float = 0.1


class RobertaLayer(nn.Module):
    cfg: RobertaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, token_valid, deterministic=True):
        c = self.cfg
        attn_out, _ = MultiHeadAttention(
            c.hidden_size, c.num_heads, dropout=c.dropout, dtype=self.dtype,
            name="attention",
        )(x, x, x, key_valid=token_valid, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(x + attn_out)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(h)
        if not deterministic:
            h = nn.Dropout(c.dropout)(h, deterministic=False)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="out_ln")(x + h)


class Roberta(nn.Module):
    """Returns (last_hidden_state [B, L, H], pooled_cls [B, H])."""

    cfg: RobertaConfig = RobertaConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids, token_valid, deterministic=True):
        c = self.cfg
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(token_ids)
        # RoBERTa position ids: pad positions get pad_token_id, valid tokens
        # count from pad_token_id + 1 (HF create_position_ids_from_input_ids).
        mask_i = token_valid.astype(jnp.int32)
        position_ids = jnp.cumsum(mask_i, axis=1) * mask_i + c.pad_token_id
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings"
        )(position_ids)
        tok_type = nn.Embed(
            c.type_vocab_size, c.hidden_size, name="token_type_embeddings"
        )(jnp.zeros_like(token_ids))
        x = word + pos + tok_type
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_ln")(x)
        if not deterministic:
            x = nn.Dropout(c.dropout)(x, deterministic=False)

        for i in range(c.num_layers):
            x = RobertaLayer(c, dtype=self.dtype, name=f"layer_{i}")(
                x, token_valid, deterministic=deterministic
            )

        pooled = nn.Dense(c.hidden_size, dtype=self.dtype, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled


class FeatureResizer(nn.Module):
    """768 -> d_model linear + LN(eps 1e-12) + dropout. ref bert.py:77-96."""

    out_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(x)
        x = nn.LayerNorm(epsilon=1e-12, name="ln")(x)
        if not deterministic:
            x = nn.Dropout(self.dropout)(x, deterministic=False)
        return x


class TextEncoder(nn.Module):
    """RoBERTa + resizer: returns (text_feats [B, L, d], text_cls [B, d]).

    ref models/language_model/bert.py:59-74 (the resizer is applied both to
    the token sequence and the pooler CLS).
    """

    d_model: int
    cfg: RobertaConfig = RobertaConfig()
    dtype: jnp.dtype = jnp.float32
    # freeze the roberta BODY only (ref bert.py:48-50 requires_grad_(False));
    # the resizer stays trainable. stop_gradient cuts the body's backward
    # out of the compiled step, matching torch's cost profile.
    freeze_body: bool = False

    @nn.compact
    def __call__(self, token_ids, token_valid, deterministic=True):
        hidden, pooled = Roberta(self.cfg, dtype=self.dtype, name="roberta")(
            token_ids, token_valid, deterministic=deterministic
        )
        if self.freeze_body:
            hidden = jax.lax.stop_gradient(hidden)
            pooled = jax.lax.stop_gradient(pooled)
        resizer = FeatureResizer(
            self.d_model, dropout=self.cfg.dropout, dtype=self.dtype,
            name="resizer",
        )
        text_feats = resizer(hidden, deterministic=deterministic)
        text_cls = resizer(pooled, deterministic=deterministic)
        return text_feats, text_cls
