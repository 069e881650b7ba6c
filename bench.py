"""End-to-end per-chip throughput benchmark (driver-run, one JSON line).

Config: BASELINE.json tracked config #2-style -- STCAT R101 + RoBERTa-base,
res 416, 64-frame clips, bf16. The primary metric counts 64-frame eval
stream forwards per second per chip, now run the way `eval.engine.do_eval`
actually runs them: BOTH temporal streams of a test clip stacked into one
batch-2 forward (the reference runs them serially, engine/evaluate.py:106).
The same JSON line also carries the full training-step time (grad + AdamW
4-LR-group optimizer + EMA, per-block remat) so the train path is
driver-verified, not just claimed.

vs_baseline: the reference publishes NO throughput numbers (SURVEY.md §6).
BASELINE_CLIPS_PER_SEC below is our measured-elsewhere estimate of the
PyTorch reference's per-GPU eval forward rate at this config (~1.4 it/s for
a 64x416x416 R101+RoBERTa forward on the reference's 8-GPU-node class
hardware); the driver-recorded ratio is against that constant, and the
absolute clips/sec/chip is the durable metric.
"""

import dataclasses
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CLIPS_PER_SEC = 1.4  # estimated torch reference per-GPU rate


def measure_eval(model, variables, batch, n_iters=10):
    """Steady-state batch-2 (stacked two-stream) eval forward, ms/iter."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def fwd_loop(variables, batch):
        # the output checksum perturbs the next iteration's frames so XLA
        # cannot hoist the loop body; a scalar fetch forces completion (this
        # platform's block_until_ready does not synchronize). The batch is a
        # jit ARGUMENT -- baking masks in as constants overflows the remote
        # compile payload at long-clip shapes.
        def body(frames, _):
            b = dataclasses.replace(batch, frames=frames)
            out = model.apply(variables, b, deterministic=True)
            chk = jnp.sum(out["pred_boxes"]) + jnp.sum(out["pred_sted"])
            return frames + 1e-12 * chk, chk

        frames, chks = jax.lax.scan(body, batch.frames, None, length=n_iters)
        return jnp.sum(chks)

    np.asarray(fwd_loop(variables, batch))  # compile + warmup
    t0 = time.perf_counter()
    np.asarray(fwd_loop(variables, batch))
    return (time.perf_counter() - t0) / n_iters * 1e3


def measure_train_step(cfg, model, variables, batch, n_iters=30):
    """Steady-state full train step (grad+clip+AdamW 4 groups+EMA), ms/step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stcat_tpu.core.batch import VideoTargets
    from stcat_tpu.core.mesh import make_mesh, shard_batch
    from stcat_tpu.train.optimizer import make_optimizer
    from stcat_tpu.train.step import create_train_state, make_train_step

    b, t = batch.frames.shape[:2]
    actioness = np.zeros((b, t), np.float32)
    actioness[:, t // 4: t // 2] = 1.0
    boxes = np.zeros((b, t, 4), np.float32)
    boxes[:, t // 4: t // 2] = np.asarray([0.5, 0.5, 0.2, 0.2], np.float32)
    targets = VideoTargets(
        boxes=boxes,
        box_valid=actioness.astype(bool),
        actioness=actioness,
        temp_bound=np.tile(np.asarray([t // 4, t // 2 - 1], np.int32), (b, 1)),
    )
    mesh = make_mesh(1)
    tx, _ = make_optimizer(cfg, variables["params"], num_training_steps=1000)
    state = create_train_state(cfg, variables, tx)
    step = make_train_step(cfg, model, tx, mesh)
    batch = shard_batch(batch, mesh)
    targets = shard_batch(targets, mesh)
    rng = jax.random.PRNGKey(0)

    # TWO warmup steps: on this platform the first EXECUTION after the
    # chipless AOT compile pays a one-time terminal-side load (~minutes);
    # steady state starts at call 3 (measured: 187s, 220s, then 0.20s).
    # n_iters=30: each python-loop step pays tunnel dispatch jitter
    # (measured spread 139-156 ms/step over 10-iter windows); a longer
    # window stabilizes the recorded number.
    for _ in range(2):
        state, m = step(state, batch, targets, rng)
        float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, batch, targets, rng)
    loss = float(m["loss"])  # scalar fetch forces completion
    dt = (time.perf_counter() - t0) / n_iters * 1e3
    assert jnp.isfinite(loss)
    return dt


def main():
    import jax

    from __graft_entry__ import _flagship_cfg, _make_batch
    from stcat_tpu.config import merge_from_list
    from stcat_tpu.models import STCATNet

    cfg = _flagship_cfg(tiny=False)
    model = STCATNet(cfg)

    t, res = 64, cfg.INPUT.RESOLUTION
    # batch 2 = the stacked even/odd streams of one 128-frame test clip
    batch2 = _make_batch(b=2, t=t, h=res, w=res, l=16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), _make_batch(1, t, res, res))

    eval_ms = measure_eval(model, variables, batch2)
    clips_per_sec = 2.0 / (eval_ms / 1e3)  # 2 stream-forwards per iteration

    train_cfg = merge_from_list(_flagship_cfg(tiny=False), ["TPU.REMAT_BACKBONE", "true"])
    train_model = STCATNet(train_cfg)
    train_ms = measure_train_step(
        train_cfg, train_model, variables, _make_batch(b=1, t=t, h=res, w=res, l=16)
    )

    print(
        json.dumps(
            {
                "metric": "eval_clips_per_sec_per_chip_r101_416_64f",
                "value": round(clips_per_sec, 4),
                "unit": "clips/s/chip",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
                "train_step_ms_r101_416_64f": round(train_ms, 2),
                "eval_stacked2_ms": round(eval_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
