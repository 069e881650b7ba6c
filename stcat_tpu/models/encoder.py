"""Cross-modal spatio-temporal encoder (factorized spatial/temporal attention).

Reference: models/grounding_model/modal_encoder.py. The factorization is the
core long-video scaling trick and maps perfectly onto TPU batching:

  - spatial layer: self-attention *within* each frame over the sequence
    [frame-CLS ; HW visual tokens ; L text tokens] -- batched over B*T frames,
    one big MXU-friendly attention of shape [B*T, S, d];
  - temporal layer: self-attention across [video-CLS ; per-frame CLS] --
    a tiny [B, T+1, d] attention with sine time embeddings;
  - the temporal context is written back into each frame's CLS slot.

The reference's per-duration Python loops (modal_encoder.py:63-77, 170-195)
are pure reshapes here because the batch is fixed-shape [B, T, ...] with
validity masks. Cost stays O(T*(1+HW+L)^2 + T^2) -- never O((T*HW)^2).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.embeddings import sine_time_embedding
from .attention import MultiHeadAttention

xavier = nn.initializers.xavier_uniform()


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer, ReLU FFN. ref modal_encoder.py:207-242."""

    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, pos, valid, deterministic=True):
        qk = x + pos
        attn, _ = MultiHeadAttention(
            self.d_model, self.num_heads, dropout=self.dropout, dtype=self.dtype,
            impl=self.impl, name="self_attn",
        )(qk, qk, x, key_valid=valid, deterministic=deterministic)
        drop = lambda h: h if deterministic else nn.Dropout(self.dropout)(h, deterministic=False)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(attn))
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, kernel_init=xavier, name="linear1")(x)
        h = drop(nn.relu(h))
        h = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=xavier, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(h))


class TimeEmbedding(nn.Module):
    """Sine table (default) or learned time embedding. ref position_encoding.py:7-37."""

    max_len: int
    d_model: int
    learned: bool = False

    @nn.compact
    def __call__(self, length: int) -> jnp.ndarray:
        if self.learned:
            table = self.param(
                "embed", nn.initializers.normal(1.0), (self.max_len, self.d_model)
            )
            return table[:length]
        return sine_time_embedding(self.max_len, self.d_model)[:length]


class CrossModalEncoder(nn.Module):
    """Returns (memory [B,T,M,d], frames_cls [B,T,d], videos_cls [B,d]).

    M = HW + L (the frame-CLS slot is stripped from the returned memory,
    ref modal_encoder.py:200-204).
    """

    d_model: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    max_video_len: int
    dropout: float = 0.1
    learned_time_embed: bool = False
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        vis_feats: jnp.ndarray,    # [B, T, Hf, Wf, d]
        vis_valid: jnp.ndarray,    # [B, T, Hf, Wf] bool
        vis_pos: jnp.ndarray,      # [B, T, Hf, Wf, d]
        text_feats: jnp.ndarray,   # [B, L, d]
        text_valid: jnp.ndarray,   # [B, L] bool
        frame_valid: jnp.ndarray,  # [B, T] bool
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b, t, hf, wf, d = vis_feats.shape
        l = text_feats.shape[1]
        hw = hf * wf

        # learned tokens / embeddings (ref modal_encoder.py:120-124)
        frame_cls = self.param("frame_cls", nn.initializers.normal(1.0), (d,))
        video_cls_tok = self.param("video_cls", nn.initializers.normal(1.0), (d,))
        local_pos = self.param("local_pos_embed", nn.initializers.normal(1.0), (d,))

        # per-frame token sequence [CLS | HW visual | L text]
        vis_tok = vis_feats.reshape(b, t, hw, d)
        txt_tok = jnp.broadcast_to(text_feats[:, None], (b, t, l, d))
        cls_tok = jnp.broadcast_to(frame_cls, (b, t, 1, d))
        x = jnp.concatenate([cls_tok, vis_tok, txt_tok], axis=2)  # [B,T,S,d]

        pos = jnp.concatenate(
            [
                jnp.broadcast_to(local_pos, (b, t, 1, d)),
                vis_pos.reshape(b, t, hw, d),
                jnp.zeros((b, t, l, d), vis_pos.dtype),
            ],
            axis=2,
        )
        valid = jnp.concatenate(
            [
                jnp.ones((b, t, 1), bool),
                vis_valid.reshape(b, t, hw),
                jnp.broadcast_to(text_valid[:, None], (b, t, l)),
            ],
            axis=2,
        )  # [B, T, S]
        s = 1 + hw + l

        time_pos = TimeEmbedding(
            self.max_video_len + 1, d, learned=self.learned_time_embed,
            name="time_embed",
        )(t + 1)  # [T+1, d]
        temp_valid = jnp.concatenate([jnp.ones((b, 1), bool), frame_valid], axis=1)

        video_cls = jnp.broadcast_to(video_cls_tok, (b, d))

        for i in range(self.num_layers):
            # spatial: batch frames into the leading axis
            xf = x.reshape(b * t, s, d)
            xf = TransformerEncoderLayer(
                self.d_model, self.num_heads, self.ffn_dim, self.dropout,
                dtype=self.dtype, impl=self.impl, name=f"spatial_{i}",
            )(xf, pos.reshape(b * t, s, d), valid.reshape(b * t, s),
              deterministic=deterministic)
            x = xf.reshape(b, t, s, d)

            # temporal: [video-CLS ; frame-CLS_t] sequence
            seq = jnp.concatenate([video_cls[:, None], x[:, :, 0]], axis=1)  # [B,T+1,d]
            seq = TransformerEncoderLayer(
                self.d_model, self.num_heads, self.ffn_dim, self.dropout,
                dtype=self.dtype, impl=self.impl, name=f"temporal_{i}",
            )(seq, jnp.broadcast_to(time_pos, (b, t + 1, d)), temp_valid,
              deterministic=deterministic)
            video_cls = seq[:, 0]
            # dispatch temporal context back into each frame's CLS slot, but
            # only for valid frames (ref writes only the real durations back,
            # modal_encoder.py:187-195)
            new_cls = jnp.where(frame_valid[..., None], seq[:, 1:], x[:, :, 0])
            x = x.at[:, :, 0].set(new_cls)

        frames_cls = x[:, :, 0]
        memory = x[:, :, 1:]
        mem_valid = valid[:, :, 1:]
        return memory, mem_valid, frames_cls, video_cls
