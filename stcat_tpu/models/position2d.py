"""Selectable 2-D position encodings for the visual feature map.

ref models/vision_model/position_encoding.py: "sine" (default, used by every
published recipe), "sineHW" (independent H/W temperatures 20/20), and
"learned" (row/col embedding tables). Selected by MODEL.VISION_BACKBONE.POS_ENC.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from ..ops.embeddings import _interleave_sincos, sine_position_embedding_2d


def sine_position_embedding_2d_hw(
    pixel_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature_h: float = 20.0,
    temperature_w: float = 20.0,
    scale: float = 2 * math.pi,
) -> jnp.ndarray:
    """PositionEmbeddingSineHW (ref position_encoding.py:6-48), normalized."""
    not_mask = pixel_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=-2)
    x_embed = jnp.cumsum(not_mask, axis=-1)
    eps = 1e-6
    y_embed = y_embed / (y_embed[..., -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[..., :, -1:] + eps) * scale

    def dim_t(temp):
        t = jnp.arange(num_pos_feats, dtype=jnp.float32)
        return temp ** (2.0 * jnp.floor(t / 2.0) / num_pos_feats)

    pos_x = _interleave_sincos(x_embed[..., None] / dim_t(temperature_w))
    pos_y = _interleave_sincos(y_embed[..., None] / dim_t(temperature_h))
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class LearnedPositionEmbedding2D(nn.Module):
    """Row/col embedding tables (50 x d/2 each). ref position_encoding.py:97-131."""

    num_pos_feats: int = 128
    table_size: int = 50

    @nn.compact
    def __call__(self, pixel_mask: jnp.ndarray) -> jnp.ndarray:
        h, w = pixel_mask.shape[-2:]
        rows = self.param(
            "row_embed", nn.initializers.uniform(1.0), (self.table_size, self.num_pos_feats)
        )
        cols = self.param(
            "col_embed", nn.initializers.uniform(1.0), (self.table_size, self.num_pos_feats)
        )
        x_emb = cols[:w]  # [w, d/2]
        y_emb = rows[:h]  # [h, d/2]
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(x_emb[None, :, :], (h, w, self.num_pos_feats)),
                jnp.broadcast_to(y_emb[:, None, :], (h, w, self.num_pos_feats)),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(pos, pixel_mask.shape + (2 * self.num_pos_feats,))


class PositionEncoding2D(nn.Module):
    """Dispatch on POS_ENC. ref build_position_encoding (position_encoding.py:134-146)."""

    kind: str  # sine | sineHW | learned
    num_pos_feats: int

    @nn.compact
    def __call__(self, pixel_mask: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "sine":
            return sine_position_embedding_2d(pixel_mask, self.num_pos_feats)
        if self.kind == "sineHW":
            return sine_position_embedding_2d_hw(pixel_mask, self.num_pos_feats)
        if self.kind == "learned":
            return LearnedPositionEmbedding2D(self.num_pos_feats, name="learned")(pixel_mask)
        raise ValueError(f"unsupported POS_ENC {self.kind}")
