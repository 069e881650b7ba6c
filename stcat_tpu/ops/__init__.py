"""Pure jittable numerics shared by the model, criterion and postprocessor."""

from .boxes import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_iou_pairwise,
    generalized_box_iou_pairwise,
    np_box_iou,
)
from .embeddings import (
    sine_position_embedding_2d,
    sine_time_embedding,
    anchor_sine_embedding,
)
from .misc import inverse_sigmoid, masked_softmax
from .sted import gaussian_sted_target, decode_sted

__all__ = [
    "box_cxcywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "box_iou_pairwise",
    "generalized_box_iou_pairwise",
    "np_box_iou",
    "sine_position_embedding_2d",
    "sine_time_embedding",
    "anchor_sine_embedding",
    "inverse_sigmoid",
    "masked_softmax",
    "gaussian_sted_target",
    "decode_sted",
]
