"""Fused (flash-style) masked attention as a Pallas TPU kernel.

Hot path served: the cross-modal encoder's per-frame spatial self-attention --
batch B*T frames, sequence S = 1 + HW + L (~223 @448), 8 heads of 32. The
unfused form materializes [B*T, 8, S, S] logits+weights in HBM every layer
(~100 MB/layer at T=64); the fused kernel keeps the whole online-softmax in
VMEM and writes only the [B*T, S, D] output. The same kernel also serves the
time-aligned decoder cross-attentions (query length 1 -> single q block).

Design notes (guide: /opt/skills/guides/pallas_guide.md):
  - grid = (batch*heads, q blocks); K/V streamed in k-blocks with the
    running max/sum online-softmax recurrence in fp32 scratch;
  - key-padding mask arrives as an additive fp32 bias row [batch, S]
    (0 valid / -1e30 padded), added pre-softmax exactly like the unfused
    path's jnp.where;
  - q/k/v blocks are zero-padded to the (8, 128) fp32 tile grid by the
    BlockSpec machinery; the mask bias makes padded KEYS contribute nothing,
    and padded QUERY rows produce garbage rows that the caller's frame mask
    already ignores downstream (identical contract to the unfused path);
  - backward: jax.custom_vjp recomputing attention in XLA (the [S, S]
    weights exist only inside the backward program; forward stays fused).
    A fully fused Pallas backward is a planned optimization.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_DEFAULT_IMPL = "xla"

# toggled by tests to exercise the kernel via the Pallas interpreter on CPU
_INTERPRET = False


def use_pallas(impl: str) -> bool:
    if impl != "pallas":
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend == "tpu"


def _ceil_to(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


# --------------------------------------------------------------------------
# Pallas forward
# --------------------------------------------------------------------------

def _flash_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, g, kblocks, bk, scale):
    """One (batch-head group, q-block) program: online softmax over k blocks.

    Block shapes: q_ref [G, BQ, D]; k_ref/v_ref [G, S, D]; bias_ref [G, 1, S];
    o_ref [G, BQ, D]. The G batch-heads per program amortize program-switch
    overhead (with S~224, D=32 a single head's matmuls are far too small to
    fill a program).
    """
    for gi in range(g):
        q = q_ref[gi].astype(jnp.float32) * scale
        bq, d = q.shape
        m = jnp.full((bq, 1), -1e30, jnp.float32)
        l = jnp.zeros((bq, 1), jnp.float32)
        acc = jnp.zeros((bq, d), jnp.float32)

        # static unrolled loop over k blocks
        for i in range(kblocks):
            k = k_ref[gi, i * bk:(i + 1) * bk, :].astype(jnp.float32)
            v = v_ref[gi, i * bk:(i + 1) * bk, :].astype(jnp.float32)
            bias = bias_ref[gi, 0, i * bk:(i + 1) * bk].astype(jnp.float32)
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + bias[None, :]
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
            m = m_new

        o_ref[gi] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd(q, k, v, bias, block_q=256, block_k=512, group=8):
    """q [BH, Sq, D], k/v [BH, Sk, D], bias [BH, Sk] fp32 additive."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, sq, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    bq = min(block_q, _ceil_to(sq, 8))
    sq_p = _ceil_to(sq, bq)
    bk = min(block_k, _ceil_to(sk, 128))
    sk_p = _ceil_to(sk, bk)
    kblocks = sk_p // bk
    g = math.gcd(group, bh)

    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))
    biasp = jnp.pad(bias, ((0, 0), (0, sk_p - sk)), constant_values=-1e30)
    biasp = biasp[:, None, :]  # [BH, 1, S]: TPU block tiling needs >=3D here

    kernel = functools.partial(
        _flash_fwd_kernel, g=g, kblocks=kblocks, bk=bk, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh // g, sq_p // bq),
        in_specs=[
            pl.BlockSpec((g, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sk_p, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sk_p, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, sk_p), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        interpret=_INTERPRET,
    )(qp, kp, vp, biasp)
    return out[:, :sq, :]


# --------------------------------------------------------------------------
# custom VJP: fused forward, recompute backward in XLA
# --------------------------------------------------------------------------

def _xla_attention(q, k, v, bias):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    logits = logits + bias[:, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", w, v.astype(jnp.float32)).astype(q.dtype)


@jax.custom_vjp
def flash_attention(q, k, v, bias):
    """Masked scaled-dot-product attention, fused on TPU.

    Args:
        q: [BH, Sq, D]; k, v: [BH, Sk, D]; bias: [BH, Sk] additive fp32
           (0 = attendable, -1e30 = masked).
    Returns: [BH, Sq, D].
    """
    return _flash_fwd(q, k, v, bias)


def _fwd(q, k, v, bias):
    return _flash_fwd(q, k, v, bias), (q, k, v, bias)


def _bwd(res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(_xla_attention, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias


flash_attention.defvjp(_fwd, _bwd)
