"""Fused (flash-style) masked attention as a Pallas TPU kernel.

Supports split q/k vs v widths (the reference's forked no-projection MHA has
qk width 2*d_model and v width d_model, grounding_model/attention.py:60-393),
so it can serve every attention instance in the model: encoder spatial
self-attention, the spatial decoder's concat cross-attention (query length 1,
Dk=64/Dv=32 per head) and the time decoder's cross-attention.

Measured-on-v5e routing policy (see docs/STATUS.md for the table): at the
recipe sequence lengths (S~223) XLA's unfused attention is already at the
bandwidth/VPU bound and the fused kernel does NOT win -- ``attention_core``
therefore routes to the kernel only for long sequences (>= MIN_FUSED_SEQ),
where eliminating the [S, S] HBM round-trips wins 1.7x at S=1024 and
2.0x at S=2048 (d=64, bf16).

Design notes (guide: /opt/skills/guides/pallas_guide.md):
  - the key-padding bias is FOLDED INTO THE LOGITS MATMUL: q gains a
    constant-1 trailing column and k gains the bias as a trailing feature, so
    [q,1]@[k,bias]^T = q@k^T + bias. This costs zero extra VMEM and avoids a
    [G,1,S] -> [G,BQ,S] broadcast that crashes this Mosaic version's
    vector-layout pass;
  - matmuls run in the INPUT dtype (bf16 on the production path) with fp32
    accumulation; softmax statistics stay fp32. Forcing fp32 MXU passes was
    measured 40% slower end-to-end;
  - grid = (batch-head groups [parallel], q blocks [arbitrary]); the whole
    K/V lives in VMEM per program, with an fp32 online-softmax recurrence
    across k-blocks when the [BQ, S] tile alone would not fit;
  - backward: one fused Pallas kernel per batch-head group that RECOMPUTES
    logits/softmax in VMEM from the saved inputs (no lse/output residuals,
    no [S,S] HBM traffic) and emits dq/dk/dv/dbias in a single pass; falls
    back to an XLA recompute when the [Sq, Sk] tile exceeds the VMEM budget.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_DEFAULT_IMPL = "xla"

# toggled by tests to exercise the kernel via the Pallas interpreter on CPU
_INTERPRET = False

# route to the fused kernel only when a sequence is at least this long
# (below it, XLA's unfused attention measured faster on v5e -- STATUS.md)
MIN_FUSED_SEQ = 768

# largest padded Sq*Sk tile (fp32 words) for the single-tile fused backward
_BWD_MAX_TILE = 512 * 1024

# VMEM budgets (fp32 words) for one [BQ, S] weight tile per program; the
# forward keeps ~2 such tiles live (logits, p), the backward ~5 (logits, p,
# w, dp, ds), hence the smaller backward budget
_FWD_TILE_BUDGET = 512 * 1024
_BWD_TILE_BUDGET = 192 * 1024

# byte budget for one program's double-buffered q/k/v/o blocks, computed on
# Mosaic's PADDED dims (minor dim -> 128 lanes, second-minor -> 8/16
# sublanes). Half the 16 MB scoped-vmem limit leaves room for the fp32
# softmax temporaries and the pipeline's copy machinery.
_VMEM_BYTES_BUDGET = 8 * 1024 * 1024


def use_pallas(impl: str) -> bool:
    if impl != "pallas":
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend == "tpu"


def should_fuse(sq: int, sk: int) -> bool:
    """Shape-based routing: fused only where it beats XLA (long sequences)."""
    return max(sq, sk) >= MIN_FUSED_SEQ


def _ceil_to(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def _pick_group(bh: int, sq_p: int, sk_p: int, cap: int = 32,
                budget: int = _FWD_TILE_BUDGET, *,
                dk1: int = 0, dv: int = 0, itemsize: int = 2,
                block_sets: int = 1) -> int:
    """Largest head-group whose fp32 weight tiles AND padded input blocks fit.

    The weight-tile bound alone is not enough when Sq is tiny and Sk long
    (the temporal decoder's cross-attention at 128f@448: q [128,8,33],
    k [128,896,33]): Mosaic pads each block's minor dim to 128 lanes, so the
    K/V blocks' true VMEM footprint is sk_p * 128-padded-depth per head, and
    the grid pipeline double-buffers them -- g=32 there allocated 28 MB of
    scoped vmem against a 16 MB limit. Bound g by the padded, double-buffered
    byte footprint as well.
    """
    g = max(1, min(cap, budget // max(1, sq_p * sk_p)))
    if dk1 and dv:
        sub = 16 if itemsize == 2 else 8
        depth = _ceil_to(dk1, 128) + _ceil_to(dv, 128)
        per_g = (_ceil_to(sq_p, sub) + _ceil_to(sk_p, sub)) * depth
        # double-buffered; block_sets=2 for the backward, whose dq/dk/dv
        # OUTPUT blocks occupy (almost) a second copy of the input set
        per_g *= itemsize * 2 * block_sets
        g = min(g, max(1, _VMEM_BYTES_BUDGET // per_g))
    while bh % g:  # largest divisor of bh within the budget (g <= 32)
        g -= 1
    return g


def _fold_bias(q, k, bias, scale, sq_p, sk_p):
    """Append the constant-1 / bias columns and pad to tile boundaries."""
    bh, sq, dk = q.shape
    sk = k.shape[1]
    ones = jnp.ones((bh, sq, 1), q.dtype)
    qa = jnp.concatenate([(q * scale).astype(q.dtype), ones], axis=-1)
    ka = jnp.concatenate([k, bias[:, :, None].astype(k.dtype)], axis=-1)
    qp = jnp.pad(qa, ((0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        # padded keys must stay masked: bias column -1e30, features 0
        padmask = jnp.zeros((bh, sk_p - sk, dk + 1), k.dtype)
        padmask = padmask.at[:, :, dk].set(jnp.asarray(-1e30, k.dtype))
        kp = jnp.concatenate([ka, padmask], axis=1)
    else:
        kp = ka
    return qp, kp


# --------------------------------------------------------------------------
# Pallas forward
# --------------------------------------------------------------------------

def _bdot(a, b, contract_a, contract_b):
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, kblocks, bk):
    """One (group, q-block) program; online softmax over k blocks.

    q_ref [G, BQ, Dk+1] (bias folded); k_ref [G, S, Dk+1]; v_ref [G, S, Dv];
    o_ref [G, BQ, Dv]. kblocks == 1 collapses to a single fused tile.
    """
    q = q_ref[:]
    g, bq, _ = q.shape
    dv = v_ref.shape[-1]
    m = jnp.full((g, bq, 1), -1e30, jnp.float32)
    l = jnp.zeros((g, bq, 1), jnp.float32)
    acc = jnp.zeros((g, bq, dv), jnp.float32)

    for i in range(kblocks):
        k = k_ref[:, i * bk:(i + 1) * bk, :]
        v = v_ref[:, i * bk:(i + 1) * bk, :]
        logits = _bdot(q, k, 2, 2)  # [G, BQ, bk] fp32, bias included
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + _bdot(p.astype(v.dtype), v, 2, 1)
        m = m_new

    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd(q, k, v, bias, block_q=512, block_k=1024, group=32):
    """q [BH, Sq, Dk], k [BH, Sk, Dk], v [BH, Sk, Dv], bias [BH, Sk] fp32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, sq, dk = q.shape
    sk = k.shape[1]
    dv = v.shape[2]
    scale = 1.0 / math.sqrt(dk)

    bq = min(block_q, _ceil_to(sq, 8))
    sq_p = _ceil_to(sq, bq)
    bk = min(block_k, _ceil_to(sk, 128))
    sk_p = _ceil_to(sk, bk)
    kblocks = sk_p // bk
    g = _pick_group(bh, bq, sk_p, cap=group,
                    dk1=dk + 1, dv=dv, itemsize=q.dtype.itemsize)

    qp, kp = _fold_bias(q, k, bias, scale, sq_p, sk_p)
    vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))

    kernel = functools.partial(_flash_fwd_kernel, kblocks=kblocks, bk=bk)
    out = pl.pallas_call(
        kernel,
        grid=(bh // g, sq_p // bq),
        in_specs=[
            pl.BlockSpec((g, bq, dk + 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sk_p, dk + 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sk_p, dv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, bq, dv), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp)
    return out[:, :sq, :]


# --------------------------------------------------------------------------
# fused Pallas backward: recompute softmax in VMEM, emit dq/dk/dv/dbias
# --------------------------------------------------------------------------

def _flash_bwd_kernel(q_ref, k_ref, v_ref, g_ref,
                      dq_ref, dk_ref, dv_ref):
    """One program per batch-head group; whole [Sq, Sk] weight tile in VMEM.

    Inputs carry the folded bias columns; d(logits) flows back into the
    folded q/k, so dq/dk gradients for the real features are the leading
    Dk columns and the bias gradient is dk's trailing column.

    d(logits) = w * (g v^T - rowsum(g * o));  dq = d(logits) k;
    dk = d(logits)^T q;  dv = w^T g.
    """
    q = q_ref[:]          # [G, SQ, Dk+1], already scaled + 1-column
    k = k_ref[:]          # [G, SK, Dk+1], bias folded
    v = v_ref[:]          # [G, SK, Dv]
    go = g_ref[:].astype(jnp.float32)

    logits = _bdot(q, k, 2, 2)  # [G, SQ, SK] fp32
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    w = p / l

    wl = w.astype(v.dtype)
    o = _bdot(wl, v, 2, 1)                          # [G, SQ, Dv] fp32
    delta = jnp.sum(go * o, axis=-1, keepdims=True)
    dp = _bdot(go.astype(v.dtype), v, 2, 2)          # [G, SQ, SK]
    ds = (w * (dp - delta)).astype(q.dtype)

    dq_ref[:] = _bdot(ds, k, 2, 1).astype(dq_ref.dtype)     # [G, SQ, Dk+1]
    dk_ref[:] = _bdot(
        ds.transpose(0, 2, 1), q, 2, 1
    ).astype(dk_ref.dtype)                                   # [G, SK, Dk+1]
    dv_ref[:] = _bdot(
        wl.transpose(0, 2, 1), go.astype(v.dtype), 2, 1
    ).astype(dv_ref.dtype)                                   # [G, SK, Dv]


def _flash_bwd(q, k, v, bias, grad_out, group=8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, sq, dk = q.shape
    sk = k.shape[1]
    dv = v.shape[2]
    scale = 1.0 / math.sqrt(dk)

    sq_p = _ceil_to(sq, 8)
    sk_p = _ceil_to(sk, 128)
    g = _pick_group(bh, sq_p, sk_p, cap=group, budget=_BWD_TILE_BUDGET,
                    dk1=dk + 1, dv=dv, itemsize=q.dtype.itemsize,
                    block_sets=2)

    qp, kp = _fold_bias(q, k, bias, scale, sq_p, sk_p)
    vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0)))
    gp = jnp.pad(grad_out, ((0, 0), (0, sq_p - sq), (0, 0)))

    kernel = _flash_bwd_kernel
    spec = lambda s, d: pl.BlockSpec((g, s, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    dqf, dkf, dvv = pl.pallas_call(
        kernel,
        grid=(bh // g,),
        in_specs=[spec(sq_p, dk + 1), spec(sk_p, dk + 1), spec(sk_p, dv),
                  spec(sq_p, dv)],
        out_specs=[spec(sq_p, dk + 1), spec(sk_p, dk + 1), spec(sk_p, dv)],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_p, dk + 1), q.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, dk + 1), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, dv), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp, gp)
    # unfold: q was scaled by `scale` before the kernel, so d(q_real) needs
    # the same factor; k's trailing column is the bias gradient
    dq = dqf[:, :sq, :dk].astype(jnp.float32) * scale
    dkk = dkf[:, :sk, :dk]
    dbias = dkf[:, :sk, dk].astype(jnp.float32)
    return dq.astype(q.dtype), dkk, dvv[:, :sk, :], dbias


# --------------------------------------------------------------------------
# custom VJP
# --------------------------------------------------------------------------

def _xla_attention(q, k, v, bias):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32
    )
    logits = logits + bias[:, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bqk,bkd->bqd", w.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


@jax.custom_vjp
def flash_attention(q, k, v, bias):
    """Masked scaled-dot-product attention, fused on TPU.

    Args:
        q: [BH, Sq, Dk]; k: [BH, Sk, Dk]; v: [BH, Sk, Dv] (Dv may differ
           from Dk -- the DAB concat cross-attention has Dk = 2*Dv);
        bias: [BH, Sk] additive fp32 (0 = attendable, -1e30 = masked).
    Returns: [BH, Sq, Dv].
    """
    return _flash_fwd(q, k, v, bias)


def _fwd(q, k, v, bias):
    return _flash_fwd(q, k, v, bias), (q, k, v, bias)


def _bwd(res, g):
    q, k, v, bias = res
    sq_p = _ceil_to(q.shape[1], 8)
    sk_p = _ceil_to(k.shape[1], 128)
    if sq_p * sk_p <= _BWD_MAX_TILE:
        return _flash_bwd(q, k, v, bias, g)
    # sequences too long for the single-tile backward: XLA recompute
    _, vjp = jax.vjp(_xla_attention, q, k, v, bias)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
