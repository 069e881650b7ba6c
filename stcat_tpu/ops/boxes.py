"""Box math (jnp, elementwise/pairwise-on-aligned-axes; plus numpy IoU for eval).

Semantics match the reference's utils/box_utils.py:63-113, except that the
loss-path GIoU is computed *pairwise over an aligned frame axis* instead of the
reference's NxM matrix + diag trick (models/criterion.py:40-42) -- on TPU the
N^2 matrix is pure waste; an aligned elementwise computation vectorizes onto
the VPU and never materializes the off-diagonal.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (cx, cy, w, h) -> (x0, y0, x1, y1). ref: utils/box_utils.py:63-66."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (x0, y0, x1, y1) -> (cx, cy, w, h). ref: utils/box_utils.py:69-72."""
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def _area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """IoU of aligned boxes [..., 4] (xyxy), broadcasting over leading dims.

    Returns (iou, union), each [...]. ref semantics: utils/box_utils.py:76-89
    restricted to the diagonal.
    """
    area1 = _area(boxes1)
    area2 = _area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / jnp.maximum(union, 1e-12)
    return iou, union


def generalized_box_iou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """GIoU of aligned boxes [..., 4] (xyxy). ref: utils/box_utils.py:92-113 diag.

    No degenerate-box asserts (they don't jit); predictions come out of a
    sigmoid so x1>=x0 by construction, and the enclosing-area denominator is
    clamped instead.
    """
    iou, union = box_iou_pairwise(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-12)


def np_box_iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """NxM IoU matrix in numpy for the host-side evaluators.

    Exact port of ref utils/box_utils.py:10-60 (the evaluators consume this;
    vIoU numbers must be bit-comparable).
    """
    boxes1 = np.asarray(boxes1, dtype=np.float64)
    boxes2 = np.asarray(boxes2, dtype=np.float64)
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = np.maximum(boxes1[:, None, :2], boxes2[:, :2])
    rb = np.minimum(boxes1[:, None, 2:], boxes2[:, 2:])
    wh = (rb - lt).clip(min=0)
    inter = wh[:, :, 0] * wh[:, :, 1]
    union = area1[:, None] + area2 - inter
    return inter / union
