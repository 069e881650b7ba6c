"""Shared tiny-model fixtures for tests."""

import jax.numpy as jnp
import numpy as np

from stcat_tpu.config import default_config, merge_from_list
from stcat_tpu.core.batch import VideoBatch, VideoTargets


def tiny_cfg(extra=()):
    return merge_from_list(
        default_config(),
        [
            "MODEL.VISION_BACKBONE.NAME", "resnet50",
            "MODEL.VISION_BACKBONE.DEPTHS", "[1,1,1,1]",
            "MODEL.STCAT.ENC_LAYERS", 2,
            "MODEL.STCAT.DEC_LAYERS", 2,
            "MODEL.STCAT.HIDDEN", 64,
            "MODEL.STCAT.HEADS", 4,
            "MODEL.STCAT.FFN_DIM", 128,
            "INPUT.MAX_VIDEO_LEN", 32,
            "MODEL.TEXT_MODEL.VOCAB_SIZE", 128,
            "MODEL.TEXT_MODEL.HIDDEN", 32,
            "MODEL.TEXT_MODEL.LAYERS", 2,
            "MODEL.TEXT_MODEL.HEADS", 2,
            "MODEL.TEXT_MODEL.INTERMEDIATE", 64,
            "MODEL.TEXT_MODEL.MAX_POS", 64,
            "TPU.COMPUTE_DTYPE", "float32",
            "TPU.REMAT_BACKBONE", "false",
        ]
        + list(extra),
    )


def make_batch_and_targets(b=1, t=8, h=32, w=32, l=6, dur=None, span=(2, 5), seed=0):
    """Synthetic clip batch with consistent GT targets."""
    rng = np.random.RandomState(seed)
    dur = dur if dur is not None else t - 1
    frame_valid = np.zeros((b, t), bool)
    frame_valid[:, :dur] = True
    actioness = np.zeros((b, t), np.float32)
    actioness[:, span[0]: span[1] + 1] = 1.0
    boxes = np.zeros((b, t, 4), np.float32)
    boxes[..., :2] = rng.uniform(0.3, 0.6, (b, t, 2))
    boxes[..., 2:] = rng.uniform(0.1, 0.3, (b, t, 2))
    box_valid = actioness.astype(bool) & frame_valid
    boxes = boxes * box_valid[..., None]
    batch = VideoBatch(
        frames=jnp.asarray(rng.randn(b, t, h, w, 3).astype(np.float32) * 0.1),
        frame_valid=jnp.asarray(frame_valid),
        pixel_valid=jnp.ones((b, t, h, w), bool),
        token_ids=jnp.asarray(rng.randint(3, 100, size=(b, l)), jnp.int32),
        token_valid=jnp.ones((b, l), bool),
    )
    targets = VideoTargets(
        boxes=jnp.asarray(boxes),
        box_valid=jnp.asarray(box_valid),
        actioness=jnp.asarray(actioness),
        temp_bound=jnp.asarray(np.tile(np.asarray(span, np.int32), (b, 1))),
    )
    return batch, targets
