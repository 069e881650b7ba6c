"""Postprocessing: model outputs -> evaluation-format boxes and temporal tubes.

Reference: models/post_processor.py:13-55. Fully vectorized and jittable: the
reference's per-video triangular-map Python loop is the masked argmax in
ops.sted.decode_sted. Frame-id mapping stays host-side (ids are ragged python
lists).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..ops.boxes import box_cxcywh_to_xyxy
from ..ops.sted import decode_sted


def postprocess(
    pred_boxes: jnp.ndarray,   # [B, T, 4] normalized cxcywh
    pred_sted: jnp.ndarray,    # [B, T, 2]
    orig_sizes: jnp.ndarray,   # [B, 2] (h, w) original pixels
    time_mask: jnp.ndarray,    # [B, T] bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (boxes_xyxy [B,T,4] in original pixels, start_idx [B], end_idx [B])."""
    boxes = box_cxcywh_to_xyxy(pred_boxes)
    h = orig_sizes[:, 0:1].astype(jnp.float32)
    w = orig_sizes[:, 1:2].astype(jnp.float32)
    scale = jnp.stack([w, h, w, h], axis=-1)  # [B,1,4]
    boxes = jnp.clip(boxes * scale, 0.0, None)  # ref clamps min=0 only
    s_idx, e_idx = decode_sted(pred_sted, time_mask)
    return boxes, s_idx, e_idx
