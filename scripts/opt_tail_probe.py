"""Optimizer/EMA update-tail probe (verdict r4 task 8, timeboxed).

The train step's post-gradient tail (AdamW 4-LR-group update + EMA) is
HBM-bandwidth-bound: per fp32 param it must read {grad, mu, nu, param,
ema} and write {mu, nu, param, ema} -- 9 floats, ~6.6 GB at the flagship's
~183 M params, i.e. ~8 ms at v5e's ~819 GB/s. A "fused AdamW+EMA optax
transform" cannot reduce those bytes: under jit the whole step is ONE XLA
program and the existing tree_maps already lower to the same elementwise
dataflow -- manual fusion changes nothing the compiler sees. What this
probe measures instead is how close the ACTUAL tail is to that roofline:

    step(full) - step(sgd-like, no EMA)  ~= adam-state + ema tail cost

Outputs one JSON line; digested into docs/STATUS.md.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(cfg_opts, n=20):
    import jax

    from __graft_entry__ import _flagship_cfg, _make_batch
    from stcat_tpu.config import merge_from_list
    from stcat_tpu.core.mesh import make_mesh, shard_batch
    from stcat_tpu.models import STCATNet
    from stcat_tpu.train.optimizer import make_optimizer
    from stcat_tpu.train.step import create_train_state, make_train_step
    from bench import _toy_targets

    cfg = merge_from_list(
        _flagship_cfg(tiny=False), ["TPU.REMAT_BACKBONE", "true"] + cfg_opts
    )
    model = STCATNet(cfg)
    batch = _make_batch(b=1, t=64, h=416, w=416, l=16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    mesh = make_mesh(1)
    tx, _ = make_optimizer(cfg, variables["params"], num_training_steps=1000)
    state = create_train_state(cfg, variables, tx)
    step = make_train_step(cfg, model, tx, mesh)
    batch = shard_batch(batch, mesh)
    targets = shard_batch(_toy_targets(1, 64), mesh)
    rng = jax.random.PRNGKey(0)
    for _ in range(2):
        state, m = step(state, batch, targets, rng)
        float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch, targets, rng)
    float(m["loss"])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO, "artifacts", "xla_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    full = measure([])                               # AdamW + EMA
    no_ema = measure(["MODEL.EMA", "false"])         # AdamW only
    sgd = measure(["SOLVER.OPTIMIZER", "sgd", "MODEL.EMA", "false"])
    rec = {
        "train_step_full_ms": round(full, 2),
        "train_step_no_ema_ms": round(no_ema, 2),
        "train_step_sgd_no_ema_ms": round(sgd, 2),
        "ema_tail_ms": round(full - no_ema, 2),
        "adam_state_tail_ms": round(no_ema - sgd, 2),
        "note": (
            "fusing AdamW+EMA by hand is a no-op under jit (single XLA "
            "program already); the tail's floor is the 9-floats/param HBM "
            "roofline (~8 ms at 183M params on v5e)"
        ),
    }
    print(json.dumps(rec))
    out = os.path.join(REPO, "artifacts", "opt_tail_probe.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
