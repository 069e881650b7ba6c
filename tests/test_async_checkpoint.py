"""Async checkpointing: saves serialize on a background thread while the
crash-resume tag only moves once a save has COMMITTED (train/checkpoint.py
save/flush). The reference's torch.save blocks the train loop for the whole
multi-GB write (ref utils/checkpoint.py:54-60, train_net.py:182-186)."""

import os

import jax.numpy as jnp
import numpy as np

from stcat_tpu.train.checkpoint import Checkpointer
from stcat_tpu.train.step import TrainState


def _state(v: float) -> TrainState:
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params={"w": jnp.full((4, 4), v, jnp.float32)},
        constants={"c": jnp.ones((2,), jnp.float32)},
        opt_state={"mu": {"w": jnp.zeros((4, 4), jnp.float32)}},
        ema_params={"w": jnp.full((4, 4), v * 2, jnp.float32)},
    )


def test_tag_moves_only_after_commit(tmp_path):
    ckpt = Checkpointer(str(tmp_path), keep=5)
    tag = os.path.join(str(tmp_path), "checkpoints", "last_checkpoint")

    ckpt.save(1, _state(1.0))          # async: tag must not be trusted yet
    ckpt.flush()
    assert ckpt.last_step() == 1

    # a donated-buffer stand-in: mutate the host copy AFTER save returns --
    # orbax must have snapshotted device->host already
    s2 = _state(2.0)
    ckpt.save(2, s2)
    s2.params["w"].delete()            # simulate the train step reusing buffers
    ckpt.save(3, _state(3.0), block=True)   # implies flush of 2 first
    assert ckpt.last_step() == 3
    assert os.path.exists(tag)

    # both committed checkpoints restore with the right payloads
    got2, step2 = ckpt.restore(_state(0.0), step=2)
    assert step2 == 2
    np.testing.assert_allclose(np.asarray(got2.params["w"]), 2.0)
    got3, step3 = ckpt.restore(_state(0.0), step=3)
    np.testing.assert_allclose(np.asarray(got3.ema_params["w"]), 6.0)


def test_flush_is_idempotent_and_blocking_save_publishes(tmp_path):
    ckpt = Checkpointer(str(tmp_path), keep=3)
    ckpt.flush()                       # nothing pending: no-op
    assert ckpt.last_step() is None
    ckpt.save(7, _state(7.0), block=True)
    assert ckpt.last_step() == 7
    ckpt.flush()
    assert ckpt.last_step() == 7
    state, step = ckpt.restore(_state(0.0))
    assert step == 7
    np.testing.assert_allclose(np.asarray(state.params["w"]), 7.0)
