"""Multi-head attention for the grounding transformer stack.

Two flavors, both batch-first ([B, S, D]) and mask-convention True = VALID:

- ``MultiHeadAttention``: standard projected MHA (torch nn.MultiheadAttention
  semantics: packed in-proj + out-proj, scaling (d/h)^-0.5, optional
  head-averaged weights). Used by the encoder layers, decoder self-attention
  and the time decoder (ref modal_encoder.py:212, query_decoder.py:269,565).

- ``projection_free_attention``: attention on pre-projected q/k/v where q,k
  have a different (2x) width than v -- the DAB-style concat conditional
  cross-attention. The reference implements this by forking torch's MHA and
  deleting the input projections (models/grounding_model/attention.py:60-393);
  here it is just a function, and the hot batched instance is lowered to a
  Pallas TPU kernel (stcat_tpu/kernels) when enabled.

The attention core is shared and routes to the fused kernel for long-sequence
inference shapes; the weights-returning path keeps the unfused softmax because
the guided-attention loss consumes the full weight matrix
(ref criterion.py:111-130 -- a T x T matrix with T <= 300, trivially small).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.misc import NEG_INF


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: Optional[jnp.ndarray] = None,
    return_weights: bool = False,
    dtype: jnp.dtype = jnp.float32,
    impl: str = "xla",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    """Scaled dot-product attention over heads.

    Args:
        q: [B, H, Lq, Dk] (already scaled by caller or not -- we scale here).
        k: [B, H, Lk, Dk]
        v: [B, H, Lk, Dv]
        key_valid: [B, Lk] bool, True = attendable.
        impl: "xla" | "pallas" -- fused kernel used when weights aren't needed
            and q/k/v head dims agree (the guided-attn weight consumers keep
            the unfused path; see kernels/attention.py).
    Returns:
        (out [B, H, Lq, Dv], weights [B, Lq, Lk] head-averaged or None)
    """
    if not return_weights and dropout_rng is None and impl == "pallas":
        from ..kernels.attention import flash_attention, should_fuse, use_pallas

        # shape-based routing: XLA measured faster below MIN_FUSED_SEQ
        # (docs/STATUS.md kernel table); fused wins on long sequences
        if use_pallas(impl) and should_fuse(q.shape[2], k.shape[2]):
            b, h, lq, dk = q.shape
            lk = k.shape[2]
            dv = v.shape[-1]
            bias = (
                jnp.where(key_valid, 0.0, -1e30).astype(jnp.float32)
                if key_valid is not None
                else jnp.zeros((b, lk), jnp.float32)
            )
            bias = jnp.repeat(bias, h, axis=0)  # [B*H, Lk]
            out = flash_attention(
                q.reshape(b * h, lq, dk).astype(dtype),
                k.reshape(b * h, lk, dk).astype(dtype),
                v.reshape(b * h, lk, dv).astype(dtype),
                bias,
            )
            return out.reshape(b, h, lq, dv).astype(jnp.float32), None

    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(dtype) * scale, k.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    if key_valid is not None:
        logits = jnp.where(key_valid[:, None, None, :], logits, NEG_INF)
    # max-subtracted softmax in fp32 (ref attention.py:379-380)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    weights = jax.nn.softmax(logits, axis=-1)
    # torch nn.MultiheadAttention applies dropout to the softmax WEIGHTS
    # (inverted scaling), not the output -- preserved for training parity
    pv_weights = weights
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        pv_weights = weights * keep / (1.0 - dropout_rate)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", pv_weights.astype(dtype), v.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    if return_weights:
        return out, jnp.mean(weights, axis=1)
    return out, None


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class MultiHeadAttention(nn.Module):
    """Projected MHA with torch nn.MultiheadAttention weight layout semantics.

    Stores q/k/v projections separately (the torch packed in_proj splits
    cleanly during checkpoint conversion).
    """

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,          # [B, Lq, D]
        key: jnp.ndarray,            # [B, Lk, D]
        value: jnp.ndarray,          # [B, Lk, D]
        key_valid: Optional[jnp.ndarray] = None,   # [B, Lk] True=valid
        return_weights: bool = False,
        deterministic: bool = True,
    ):
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        rng = (
            self.make_rng("dropout")
            if (self.dropout > 0.0 and not deterministic)
            else None
        )
        out, weights = attention_core(
            _split_heads(q, self.num_heads),
            _split_heads(k, self.num_heads),
            _split_heads(v, self.num_heads),
            key_valid=key_valid,
            return_weights=return_weights,
            dtype=self.dtype,
            impl=self.impl,
            dropout_rate=self.dropout,
            dropout_rng=rng,
        )
        out = _merge_heads(out)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)
        return out, weights


class ProjectionFreeAttention(nn.Module):
    """Attention on externally-projected q/k (width qk_dim) and v (width v_dim).

    Only the output projection holds parameters. ref: the forked MHA at
    models/grounding_model/attention.py:60-181 with vdim/out_dim split.
    """

    qk_dim: int
    v_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,          # [B, Lq, qk_dim]
        key: jnp.ndarray,            # [B, Lk, qk_dim]
        value: jnp.ndarray,          # [B, Lk, v_dim]
        key_valid: Optional[jnp.ndarray] = None,
        return_weights: bool = False,
        deterministic: bool = True,
    ):
        rng = (
            self.make_rng("dropout")
            if (self.dropout > 0.0 and not deterministic)
            else None
        )
        out, weights = attention_core(
            _split_heads(query, self.num_heads),
            _split_heads(key, self.num_heads),
            _split_heads(value, self.num_heads),
            key_valid=key_valid,
            return_weights=return_weights,
            dtype=self.dtype,
            impl=self.impl,
            dropout_rate=self.dropout,
            dropout_rng=rng,
        )
        out = _merge_heads(out)
        out = nn.Dense(self.v_dim, dtype=self.dtype, name="out_proj")(out)
        return out, weights
