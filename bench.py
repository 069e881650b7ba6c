"""End-to-end per-chip throughput benchmark (driver-run, one JSON line).

Config: BASELINE.json tracked config #2-style -- STCAT R101 + RoBERTa-base,
res 416, batch 1 clip/chip, 64-frame clip, bf16 inference forward (the
two-stream eval runs two 64-frame forwards per 128-frame test clip, so
clips/sec here = eval-stream forwards/sec).

vs_baseline: the reference publishes NO throughput numbers (SURVEY.md §6).
BASELINE_CLIPS_PER_SEC below is our measured-elsewhere estimate of the
PyTorch reference's per-GPU eval forward rate at this config (~1.4 it/s for
a 64x416x416 R101+RoBERTa forward on the reference's 8-GPU-node class
hardware); the driver-recorded ratio is against that constant, and the
absolute clips/sec/chip is the durable metric.
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CLIPS_PER_SEC = 1.4  # estimated torch reference per-GPU rate


def main():
    import jax

    from __graft_entry__ import _flagship_cfg, _make_batch
    from stcat_tpu.models import STCATNet

    cfg = _flagship_cfg(tiny=False)
    model = STCATNet(cfg)

    t, res = 64, cfg.INPUT.RESOLUTION
    batch = _make_batch(b=1, t=t, h=res, w=res, l=16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    import dataclasses

    import numpy as np
    import jax.numpy as jnp

    n_iters = 10

    @jax.jit
    def fwd_loop(variables, batch):
        """n_iters forwards inside ONE program: steady-state throughput.

        The output checksum perturbs the next iteration's frames so XLA
        cannot hoist the loop body; a scalar fetch forces completion (this
        platform's block_until_ready does not synchronize). The batch is a
        jit ARGUMENT -- baking masks in as constants overflows the remote
        compile payload at long-clip shapes.
        """

        def body(frames, _):
            b = dataclasses.replace(batch, frames=frames)
            out = model.apply(variables, b, deterministic=True)
            chk = jnp.sum(out["pred_boxes"]) + jnp.sum(out["pred_sted"])
            return frames + 1e-12 * chk, chk

        frames, chks = jax.lax.scan(body, batch.frames, None, length=n_iters)
        return jnp.sum(chks)

    # compile + warmup (batch passed as arg, see docstring)
    np.asarray(fwd_loop(variables, batch))

    t0 = time.perf_counter()
    np.asarray(fwd_loop(variables, batch))
    dt = (time.perf_counter() - t0) / n_iters

    clips_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "eval_clips_per_sec_per_chip_r101_416_64f",
                "value": round(clips_per_sec, 4),
                "unit": "clips/s/chip",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
