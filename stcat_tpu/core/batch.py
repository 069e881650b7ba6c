"""Fixed-shape batch pytrees -- the TPU replacement for the reference's ragged
NestedTensor (utils/misc.py:41-97) and per-item target dicts.

Every clip is padded to a static (T, H, W): T to a frame bucket, H/W to the
training resolution. Validity masks carry raggedness through the jitted model
instead of dynamic shapes; XLA compiles one program per bucket.

Box targets are *frame-aligned*: boxes[b, t] is the GT box of frame t in
normalized cxcywh, with box_valid[b, t] marking frames inside the GT temporal
span (the reference instead gathers a flat GT-span slice per clip,
models/criterion.py:160-171; a mask is the jittable equivalent).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class VideoTargets:
    boxes: jnp.ndarray        # [B, T, 4] normalized cxcywh (zeros outside span)
    box_valid: jnp.ndarray    # [B, T] bool: frame in GT temporal span AND valid
    actioness: jnp.ndarray    # [B, T] float {0,1}
    temp_bound: jnp.ndarray   # [B, 2] int32 (start_idx, end_idx) inclusive


@flax.struct.dataclass
class VideoBatch:
    frames: jnp.ndarray       # [B, T, H, W, 3] normalized RGB
    frame_valid: jnp.ndarray  # [B, T] bool
    pixel_valid: jnp.ndarray  # [B, T, H, W] bool (multi-scale padding)
    token_ids: jnp.ndarray    # [B, L] int32
    token_valid: jnp.ndarray  # [B, L] bool

    @property
    def num_clips(self) -> int:
        return self.frames.shape[0]

    @property
    def num_frames(self) -> int:
        return self.frames.shape[1]


@flax.struct.dataclass
class RawVideoBatch:
    """Decoded-but-untransformed clips: uint8 pixels + a per-clip resample
    plan. The host ships 4x fewer bytes and does NO pixel math; the jitted
    step executes flip + one bilinear resample + ImageNet normalize on device
    (ops/preprocess.py) and yields a VideoBatch. Essential when the host CPU
    is weak relative to the chip (SURVEY §7.5: the reference burns host cores
    on decode+transform inside torch workers, datasets/vidstg.py:112-152).

    Geometry: frames_u8[b, t] holds the clip's true (src_h, src_w) pixels at
    the top-left of a static source canvas (Hs, Ws), with the boundary
    row/col replicated once so edge taps of the resampler clamp instead of
    reading zeros. affine_* map output coords to (post-flip) source-canvas
    coords: y_src = affine_scale[b,0]*y_out + affine_off[b,0].
    out_canvas is STATIC (part of the jit cache key): the padded target
    (H, W); out_size[b] is the clip's valid target region within it.

    YUV 4:2:0 layout (cfg.TPU.INGEST_LAYOUT "yuv420"): frames_u8 is None and
    the pixels ship as a full-res luma plane frames_y plus a quarter-res
    interleaved chroma plane frames_cbcr -- 1.5 bytes/pixel instead of 3.
    JPEG and H.264 sources store 4:2:0 YCbCr natively, so this ships what
    the codec decoded (host RGB conversion is the extra step, not this);
    the chroma upsample fuses into the device resample (ops/preprocess.py).
    JFIF chroma siting: plane sample j sits at luma coordinate 2j + 0.5.
    """

    frames_u8: Optional[jnp.ndarray]            # [B, T, Hs, Ws, 3] uint8
    frame_valid: jnp.ndarray   # [B, T] bool
    flip: jnp.ndarray          # [B] bool, horizontal flip on device
    affine_scale: jnp.ndarray  # [B, 2] f32 (ay, ax): out->src scale
    affine_off: jnp.ndarray    # [B, 2] f32 (by, bx): out->src offset
    out_size: jnp.ndarray      # [B, 2] i32 valid (h, w) in the target canvas
    token_ids: jnp.ndarray     # [B, L] int32
    token_valid: jnp.ndarray   # [B, L] bool
    out_canvas: Tuple[int, int] = flax.struct.field(pytree_node=False)
    frames_y: Optional[jnp.ndarray] = None      # [B, T, Hs, Ws] uint8
    frames_cbcr: Optional[jnp.ndarray] = None   # [B, T, Hs//2, Ws//2, 2] uint8

    @property
    def num_clips(self) -> int:
        return self.frame_valid.shape[0]

    @property
    def num_frames(self) -> int:
        return self.frame_valid.shape[1]


def subsample_stream(batch, start: int):
    """Even/odd frame stream of a VideoBatch or RawVideoBatch (ref
    utils/misc.py:55-65 NestedTensor.subsample): slice every [B, T, ...]
    leaf's frame axis, keep per-clip leaves."""
    import dataclasses

    t = batch.num_frames
    upd = {}
    for f in dataclasses.fields(batch):
        v = getattr(batch, f.name)
        if hasattr(v, "ndim") and v.ndim >= 2 and v.shape[1] == t and \
                f.name not in ("token_ids", "token_valid", "out_size",
                               "affine_scale", "affine_off"):
            upd[f.name] = v[:, start::2]
    return batch.replace(**upd)


def device_split_streams(batch):
    """Jit-traceable subsample_stream(0/1) + stack_streams fusion: the batch
    ships over the wire ONCE (wire bytes equal the host-split path -- the
    even/odd streams partition the clip) and the split becomes a strided
    slice + concat XLA folds into the consumer, removing the host-side pixel
    copies of the numpy path (ref utils/misc.py:55-65 subsample semantics).

    [B, T, ...] frame-axis leaves -> [2B, ceil(T/2), ...]; the odd stream is
    zero-padded by one frame when T is odd (masked via frame_valid). Other
    array leaves are repeated along batch; non-array fields are kept.
    """
    import dataclasses

    import jax.numpy as jnp

    b1 = subsample_stream(batch, 0)
    b2 = subsample_stream(batch, 1)
    t = b1.num_frames
    upd = {}
    for f in dataclasses.fields(b1):
        v1, v2 = getattr(b1, f.name), getattr(b2, f.name)
        if not hasattr(v1, "ndim"):
            assert v1 == v2, (f.name, v1, v2)
            continue
        if v1.ndim >= 2 and v1.shape[1] != v2.shape[1] and v2.shape[1] in (t - 1, t):
            widths = [(0, 0)] * v2.ndim
            widths[1] = (0, t - v2.shape[1])
            v2 = jnp.pad(v2, widths)
        upd[f.name] = jnp.concatenate([jnp.asarray(v1), jnp.asarray(v2)], 0)
    return b1.replace(**upd)


def stack_streams(b1, b2):
    """Concatenate two temporal streams along the batch axis (one forward of
    batch 2B instead of two of B). The odd stream is one frame shorter when
    T is odd; frame-axis leaves are zero-padded and masked via frame_valid."""
    import dataclasses

    import numpy as np

    t = b1.num_frames
    upd = {}
    for f in dataclasses.fields(b1):
        v1, v2 = getattr(b1, f.name), getattr(b2, f.name)
        if not hasattr(v1, "ndim"):
            assert v1 == v2, (f.name, v1, v2)
            continue
        v1, v2 = np.asarray(v1), np.asarray(v2)
        if v1.ndim >= 2 and v1.shape[1] != v2.shape[1] and v2.shape[1] in (t - 1, t):
            widths = [(0, 0)] * v2.ndim
            widths[1] = (0, t - v2.shape[1])
            v2 = np.pad(v2, widths)
        upd[f.name] = np.concatenate([v1, v2], 0)
    return b1.replace(**upd)
