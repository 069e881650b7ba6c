"""Small jittable helpers."""

from __future__ import annotations

import jax.numpy as jnp

# Large negative used to kill attention/softmax logits at padded positions.
# (Not -inf: -inf * 0 = nan under masking arithmetic.)
NEG_INF = -1e32


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """logit with clamping; ref models/net_utils.py:59-63."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax over `axis` with False entries excluded (True = valid).

    Max-subtracted for stability (the reference's custom MHA does the same,
    models/grounding_model/attention.py:379-380).
    """
    logits = jnp.where(mask, logits, NEG_INF)
    logits = logits - jnp.max(logits, axis=axis, keepdims=True)
    unnorm = jnp.exp(logits) * mask.astype(logits.dtype)
    return unnorm / jnp.maximum(jnp.sum(unnorm, axis=axis, keepdims=True), 1e-12)
