"""Temporal (start, end) target construction and tube decoding.

The decode replaces the reference's per-video Python loop over a T x T map
(ref models/post_processor.py:30-53) with one fully-vectorized masked argmax:
batched, jittable, and O(T^2) on the VPU instead of host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .misc import NEG_INF


def gaussian_sted_target(
    t: int,
    target_idx: jnp.ndarray,
    sigma: float,
    time_mask: jnp.ndarray = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """L1-normalized gaussian over the time axis centered at target_idx.

    This is the single source of truth for the sted training target; the
    criterion consumes it directly.

    Args:
        t: static time length.
        target_idx: [...] integer frame index of the boundary.
        time_mask: optional [..., t] bool; when given, the target is zeroed
            and re-normalized over valid frames only. The reference
            (models/criterion.py:75-101) normalizes over the full axis
            WITHOUT masking -- but its only recipe runs B=1 per device where
            the time axis is never padded, so full-axis == valid-axis there.
            Masked normalization is the exact fixed-shape generalization.
    Returns:
        [..., t] distribution.
    """
    pos = jnp.arange(t, dtype=jnp.float32)
    g = jnp.exp(
        -((pos - target_idx[..., None].astype(jnp.float32)) ** 2) / (2.0 * sigma**2)
    )
    g = g + eps
    if time_mask is not None:
        g = g * time_mask.astype(g.dtype)
    return g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-12)


def decode_sted(pred_sted: jnp.ndarray, time_mask: jnp.ndarray):
    """Decode the most probable (start, end) pair from start/end logits.

    score[s, e] = log_softmax(start)[s] + log_softmax(end)[e], restricted to
    s < e (strict: ref post_processor.py:36 keeps only the upper triangle)
    and both within the clip's valid duration.

    Args:
        pred_sted: [B, T, 2] raw logits.
        time_mask: [B, T] bool, True = valid frame.
    Returns:
        (start_idx, end_idx): each [B] int32 indices into the frame axis.
    """
    ls = jax.nn.log_softmax(pred_sted[..., 0], axis=-1)  # [B, T]
    le = jax.nn.log_softmax(pred_sted[..., 1], axis=-1)
    score = ls[:, :, None] + le[:, None, :]  # [B, T, T] indexed [b, s, e]

    t = pred_sted.shape[1]
    s_idx = jnp.arange(t)[:, None]
    e_idx = jnp.arange(t)[None, :]
    valid = (s_idx < e_idx) & time_mask[:, :, None] & time_mask[:, None, :]
    score = jnp.where(valid, score, NEG_INF)

    flat = jnp.argmax(score.reshape(score.shape[0], -1), axis=-1)
    return (flat // t).astype(jnp.int32), (flat % t).astype(jnp.int32)
