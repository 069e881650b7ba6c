"""Sinusoidal position embeddings (2-D image, 1-D time, 4-D anchor).

Numerics match the reference exactly (interleaved sin/cos with paired
frequencies) so converted checkpoints line up:
  - 2-D image sine: ref models/vision_model/position_encoding.py:51-94
  - time-sequence sine table: ref models/grounding_model/position_encoding.py:21-37
  - 4-D anchor sine (DAB-style): ref models/net_utils.py:29-56

All functions are channels-last and shape-polymorphic under jit.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _interleave_sincos(x: jnp.ndarray) -> jnp.ndarray:
    """out[..., 2k] = sin(x[..., 2k]); out[..., 2k+1] = cos(x[..., 2k+1]).

    Equivalent to the torch stack((x[0::2].sin(), x[1::2].cos()), -1).flatten
    idiom used throughout the reference.
    """
    sin = jnp.sin(x[..., 0::2])
    cos = jnp.cos(x[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*x.shape[:-1], -1)


def sine_position_embedding_2d(
    pixel_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
) -> jnp.ndarray:
    """2-D sine embedding from a validity mask.

    Args:
        pixel_mask: [..., H, W] bool, True = VALID pixel. (The reference keeps
            True = padded and inverts; we standardize on True = valid
            throughout this codebase.)
    Returns:
        [..., H, W, 2*num_pos_feats] fp32, channel order (y-feats, x-feats),
        matching ref position_encoding.py:70-94.
    """
    not_mask = pixel_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=-2)
    x_embed = jnp.cumsum(not_mask, axis=-1)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[..., -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[..., :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    pos_x = _interleave_sincos(x_embed[..., None] / dim_t)
    pos_y = _interleave_sincos(y_embed[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def sine_time_embedding(max_len: int, d_model: int) -> jnp.ndarray:
    """Fixed sinusoidal table [max_len, d_model]. ref: SeqEmbeddingSine.

    te[:, 0::2] = sin(pos * w_k), te[:, 1::2] = cos(pos * w_k) with
    w_k = exp(-(2k) ln(1e4)/d).
    """
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    angles = position * div_term  # [max_len, d/2]
    te = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    te = te.at[:, 0::2].set(jnp.sin(angles))
    te = te.at[:, 1::2].set(jnp.cos(angles))
    return te


def anchor_sine_embedding(pos: jnp.ndarray, d_half: int = 128) -> jnp.ndarray:
    """Sine embedding of normalized anchors. ref: gen_sineembed_for_position.

    Args:
        pos: [..., 2] (cx, cy) or [..., 4] (cx, cy, w, h) in [0, 1].
    Returns:
        [..., d_half * pos.shape[-1]] fp32; channel order (y, x) or
        (y, x, w, h), d_half feats each (ref net_utils.py:40-53).
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(d_half, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * jnp.floor(dim_t / 2.0) / d_half)

    def emb(coord):
        return _interleave_sincos((coord * scale)[..., None] / dim_t)

    if pos.shape[-1] == 2:
        return jnp.concatenate([emb(pos[..., 1]), emb(pos[..., 0])], axis=-1)
    if pos.shape[-1] == 4:
        return jnp.concatenate(
            [emb(pos[..., 1]), emb(pos[..., 0]), emb(pos[..., 2]), emb(pos[..., 3])],
            axis=-1,
        )
    raise ValueError(f"anchor must have 2 or 4 coords, got {pos.shape[-1]}")
