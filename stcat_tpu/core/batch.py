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
