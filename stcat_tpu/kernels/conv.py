"""Fused ResNet bottleneck block as a Pallas TPU kernel.

Why: the backbone roofline (docs/STATUS.md) shows stem+layer1+layer2 run far
below the MXU bound because XLA executes a bottleneck block as ~7 separate
HBM-round-tripping ops (conv1 -> bn/relu -> conv2 -> bn/relu -> conv3 -> bn ->
add+relu).  At 104x104x64 the block is pure HBM bandwidth; fusing the whole
block into one VMEM-resident kernel cuts the traffic to (read input + write
output) and recovers the difference.  The reference's backbone is plain
torchvision (reference models/vision_model/backbone.py:69-122); this fusion
has no reference counterpart -- it is the TPU-native answer to cuDNN's fused
conv epilogues.

Scope: stride-1 bottleneck blocks (optionally dilated, optionally with a 1x1
downsample projection), i.e. every block of layer1 and the non-first blocks
of layers 2-4 -- the first blocks of layers 2-4 are stride-2 and stay on XLA.
FrozenBN is pre-folded into the conv weights/biases by the caller
(models/resnet.py), so the kernel sees plain conv+bias+relu algebra:

    x1   = relu(x  @ W1 + b1)            # 1x1, Cin -> P
    y2   = relu(conv3x3(x1, W2) + b2)    # 9 tap-matmuls, P -> P
    y3   = y2 @ W3 + b3                  # 1x1, P -> Cout
    res  = x @ Wd + bd  (or x)           # optional 1x1 projection
    out  = relu(y3 + res)

Design (guide: /opt/skills/guides/pallas_guide.md):
  - grid = (frames, row-chunks); the input BlockSpec block is the WHOLE
    frame with an index map that ignores the chunk index, so the standard
    Pallas pipeline double-buffers it across frames and chunk programs of
    the same frame reuse the resident copy. Overlapping (haloed) blocks are
    not expressible with BlockSpec index maps; a manual halo-DMA variant was
    built and measured first but lost (serial DMA waits, and Mosaic only
    ref-slices HBM at (8,128)-aligned offsets/sizes -- w=52/26/13 stages
    cannot comply). Chunk bounds are STATIC per `pl.when` branch, so each
    program takes plain value slices of the frame;
  - conv2's zero padding lives in x1-space (torch pads conv2's input):
    halo rows/cols are padded with exact zeros after conv1, so no interior
    re-masking is needed;
  - the 3x3 conv is 9 shifted rank-3 matmuls ([CH, W, P] @ [P, P]) with fp32
    accumulation -- no im2col materialization, no reshapes (Mosaic dislikes
    layout-changing reshapes; rank-3 `dot_general` keeps the lane dim = P);
  - matmuls run in the input dtype (bf16 on the production path) with fp32
    accumulation, like kernels/attention.py;
  - backward: XLA recompute of the reference algebra via `jax.custom_vjp` --
    the production call sites (stem/layer1) are FROZEN in every reference
    recipe (reference backbone.py:78-85), so the backward only exists for
    completeness when a non-frozen stage routes here.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# toggled by tests to exercise the kernel via the Pallas interpreter on CPU
_INTERPRET = False

# per-program VMEM soft budget (bytes) used to size row tiles
_TILE_BUDGET = 14 * 1024 * 1024


class BlockWeights(NamedTuple):
    """Folded (BN absorbed) bottleneck weights; biases are [1, 1, C]."""

    w1: jnp.ndarray  # [Cin, P]
    b1: jnp.ndarray  # [1, 1, P]
    w2: jnp.ndarray  # [3, 3, P, P]
    b2: jnp.ndarray  # [1, 1, P]
    w3: jnp.ndarray  # [P, Cout]
    b3: jnp.ndarray  # [1, 1, Cout]
    wd: Optional[jnp.ndarray]  # [Cin, Cout] or None
    bd: Optional[jnp.ndarray]  # [1, 1, Cout] or None


def use_pallas(impl: str) -> bool:
    if impl != "pallas":
        return False
    if _INTERPRET:  # CPU tests force the kernel through the interpreter
        return True
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend == "tpu"


def _vmem_est(h: int, w: int, cin: int, p: int, cout: int, d: int, R: int) -> int:
    """Per-program VMEM footprint (bytes) with the frame split into R chunks."""
    ch = h // R
    return (
        2 * h * w * cin * 2                    # input frame block (x2 buffers)
        + 2 * ch * w * cout * 2                # output chunk block (x2 buffers)
        + (ch + 2 * d) * (w + 2 * d) * p * 2   # x1 (+halo)
        + ch * w * (p * 4 + p * 2)             # conv2 acc + y2
        + 2 * ch * w * cout * 4                # conv3 acc + residual (fp32)
    )


def _pick_chunks(h: int, w: int, cin: int, p: int, cout: int, d: int) -> int:
    """Smallest divisor-of-h chunk count whose footprint fits the budget."""
    for R in range(1, h + 1):
        if h % R == 0 and _vmem_est(h, w, cin, p, cout, d, R) <= _TILE_BUDGET:
            return R
    return h


def _dot(a, b):
    """[.., K] @ [K, N] rank-preserving matmul with fp32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(x_ref, w1, b1, w2, b2, w3, b3, wd, bd, o_ref, *, R, h, w, d, has_ds):
    """One program = one (frame, row-chunk). The frame block is fetched by
    the standard Pallas pipeline (its index map ignores the chunk index, so
    consecutive chunk programs reuse the resident copy); chunk bounds are
    STATIC per pl.when branch -- no dynamic slicing, no manual DMA, no
    Mosaic ref-slice alignment constraints."""
    from jax.experimental import pallas as pl

    r = pl.program_id(1)
    ch = h // R
    f32 = jnp.float32

    for rr in range(R):
        @pl.when(r == rr)
        def _(rr=rr):
            lo = rr * ch
            top, bot = max(lo - d, 0), min(lo + ch + d, h)
            xs = x_ref[0, top:bot]
            x1 = jnp.maximum(_dot(xs, w1[:]) + b1[:].astype(f32), 0.0)
            # conv2's zero padding lives in x1-space: halo rows beyond the
            # image and the d-wide column ring are exact zeros (torch pads
            # conv2's INPUT, which is x1).
            x1 = jnp.pad(
                x1.astype(xs.dtype),
                ((d - (lo - top), d - (bot - lo - ch)), (d, d), (0, 0)),
            )
            acc = b2[:].astype(f32)
            for ky in range(3):
                for kx in range(3):
                    tap = x1[ky * d: ky * d + ch, kx * d: kx * d + w, :]
                    acc = acc + _dot(tap, w2[ky, kx])
            y2 = jnp.maximum(acc, 0.0).astype(xs.dtype)
            y3 = _dot(y2, w3[:]) + b3[:].astype(f32)
            xc = x_ref[0, lo: lo + ch]
            if has_ds:
                res = _dot(xc, wd[:]) + bd[:].astype(f32)
            else:
                res = xc.astype(f32)
            o_ref[:] = jnp.maximum(y3 + res, 0.0)[None].astype(o_ref.dtype)


def _fused_fwd(x, p: BlockWeights, dilation: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, cin = x.shape
    d = dilation
    planes = p.w1.shape[1]
    cout = p.w3.shape[1]
    has_ds = p.wd is not None
    R = _pick_chunks(h, w, cin, planes, cout, d)
    ch = h // R

    dt = x.dtype
    cast = lambda a: a.astype(dt)
    full = lambda a: pl.BlockSpec(
        a.shape, lambda nn_, rr_: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    frame = pl.BlockSpec(
        (1, h, w, cin), lambda nn_, rr_: (nn_, 0, 0, 0), memory_space=pltpu.VMEM
    )
    args = [cast(p.w1), p.b1, cast(p.w2), p.b2, cast(p.w3), p.b3]
    specs = [frame] + [full(a) for a in args]
    if has_ds:
        args += [cast(p.wd), p.bd]
        specs += [full(p.wd), full(p.bd)]
    else:
        # keep the kernel arity fixed: dummy 1-element stand-ins
        dummy = jnp.zeros((1, 1), dt), jnp.zeros((1, 1, 1), jnp.float32)
        args += list(dummy)
        specs += [full(a) for a in dummy]

    kernel = functools.partial(_kernel, R=R, h=h, w=w, d=d, has_ds=has_ds)
    return pl.pallas_call(
        kernel,
        grid=(n, R),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, ch, w, cout), lambda nn_, rr_: (nn_, rr_, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(x, *args)


def bottleneck_reference(x, p: BlockWeights, dilation: int = 1):
    """Pure-XLA fused-block algebra (fallback + backward recompute).

    Bit-compatible with the flax path in models/resnet.py (same lax convs
    flax lowers to, same dtype policy: conv in x.dtype, bias-add in fp32).
    """
    dt = x.dtype
    dn = ("NHWC", "HWIO", "NHWC")

    def conv1x1(a, wmat):
        return jax.lax.conv_general_dilated(
            a, wmat[None, None].astype(dt), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )

    x1 = jnp.maximum(conv1x1(x, p.w1) + p.b1, 0.0).astype(dt)
    pad = ((dilation, dilation),) * 2
    y2 = jax.lax.conv_general_dilated(
        x1, p.w2.astype(dt), (1, 1), pad, rhs_dilation=(dilation, dilation),
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    y2 = jnp.maximum(y2 + p.b2, 0.0).astype(dt)
    y3 = conv1x1(y2, p.w3) + p.b3
    if p.wd is not None:
        res = conv1x1(x, p.wd) + p.bd
    else:
        res = x.astype(jnp.float32)
    return jnp.maximum(y3 + res, 0.0).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_bottleneck(x, p: BlockWeights, dilation: int = 1):
    """Stride-1 bottleneck block, fused on TPU.

    x: [N, H, W, Cin]; returns [N, H, W, Cout]. See BlockWeights for the
    folded parameterization. Production call sites are frozen stages, so the
    backward (XLA recompute) exists only for non-frozen routing.
    """
    return _fused_fwd(x, p, dilation)


def _vjp_fwd(x, p, dilation):
    return _fused_fwd(x, p, dilation), (x, p)


def _vjp_bwd(dilation, res, g):
    x, p = res
    _, vjp = jax.vjp(lambda x_, p_: bottleneck_reference(x_, p_, dilation), x, p)
    return vjp(g)


fused_bottleneck.defvjp(_vjp_fwd, _vjp_bwd)
