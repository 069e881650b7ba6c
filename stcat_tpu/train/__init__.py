"""Training stack: criterion, optimizer groups, schedules, EMA, sharded step."""

from .criterion import build_weight_dict, video_stg_loss

__all__ = ["video_stg_loss", "build_weight_dict"]
