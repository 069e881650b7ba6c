"""Sequence (frame-axis) parallelism: T sharded over the mesh (SURVEY §5
long-context plan). Outputs and losses must match the unsharded run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stcat_tpu.core.mesh import make_mesh, shard_batch
from stcat_tpu.models import STCATNet
from stcat_tpu.train.optimizer import make_optimizer
from stcat_tpu.train.step import create_train_state, make_eval_forward, make_train_step
from helpers import make_batch_and_targets, tiny_cfg


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_seq_parallel_forward_matches_single_device():
    cfg_sp = tiny_cfg(["TPU.SEQUENCE_PARALLEL", "true"])
    cfg_dp = tiny_cfg()
    batch, _ = make_batch_and_targets(b=1, t=16, dur=13)
    model = STCATNet(cfg_dp)
    variables = model.init(jax.random.PRNGKey(0), batch)

    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    fwd_sp = make_eval_forward(cfg_sp, model, mesh8)
    fwd_1 = make_eval_forward(cfg_dp, model, mesh1)
    params, consts = variables["params"], variables.get("constants", {})

    out_sp = fwd_sp(params, consts, shard_batch(batch, mesh8, sequence_parallel=True))
    out_1 = fwd_1(params, consts, shard_batch(batch, mesh1))
    # different XLA partitionings accumulate different rounding; the decoder's
    # inverse_sigmoid chain amplifies it (same tolerance as the DP test)
    np.testing.assert_allclose(
        np.asarray(out_sp["pred_boxes"]), np.asarray(out_1["pred_boxes"]), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_sp["pred_sted"]), np.asarray(out_1["pred_sted"]), atol=1e-2
    )


@pytest.mark.slow  # ~180 s: 6 jitted train steps; forward parity above is the fast gate
def test_seq_parallel_train_step_runs_and_learns():
    cfg = tiny_cfg([
        "TPU.SEQUENCE_PARALLEL", "true",
        "SOLVER.BASE_LR", 1e-3, "SOLVER.TEMP_LR", 1e-3, "SOLVER.WARMUP_PROP", 0.0,
    ])
    mesh = make_mesh(8)
    model = STCATNet(cfg)
    batch, targets = make_batch_and_targets(b=1, t=16, dur=13)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tx, _ = make_optimizer(cfg, variables["params"], num_training_steps=100)
    state = create_train_state(cfg, variables, tx)
    step = make_train_step(cfg, model, tx, mesh)
    sb = shard_batch(batch, mesh, sequence_parallel=True)
    st = shard_batch(targets, mesh, sequence_parallel=True)
    losses = []
    for i in range(6):
        state, m = step(state, sb, st, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    # a 6-step window on a random-init model bounces; require clear descent
    # without demanding monotonicity (forward parity is the strict check)
    assert min(losses[1:]) < losses[0] - 0.5, losses


@pytest.mark.slow  # ~170 s: three full train-step compiles on the CPU mesh; the dryrun + nightly gate cover it
def test_combined_dp_sp_tp_matches_single_device():
    """3-D (data=2, seq=2, model=2) mesh: clips shard over 'data', each
    clip's frame axis over 'seq', Megatron head/FFN over 'model'
    (TPU.MESH_SEQ + MODEL_PARALLEL + SEQUENCE_PARALLEL composed)."""
    from stcat_tpu.core.mesh import SEQ_AXIS, shard_state
    from jax.sharding import PartitionSpec as P

    cfg_c = tiny_cfg([
        "TPU.SEQUENCE_PARALLEL", "true", "TPU.MESH_SEQ", 2,
        "TPU.MODEL_PARALLEL", 2,
    ])
    cfg_1 = tiny_cfg()
    model = STCATNet(cfg_1)
    batch, targets = make_batch_and_targets(b=2, t=16, dur=13)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    params, consts = variables["params"], variables.get("constants", {})

    mesh_c = make_mesh(8, model_parallel=2, seq_parallel=2)
    assert dict(mesh_c.shape) == {"data": 2, "seq": 2, "model": 2}
    mesh_1 = make_mesh(1)

    # forward parity vs the unsharded run
    params_c = shard_state(params, mesh_c)
    fwd_c = make_eval_forward(cfg_c, model, mesh_c, example_params=params_c)
    fwd_1 = make_eval_forward(cfg_1, model, mesh_1)
    sb = shard_batch(batch, mesh_c, sequence_parallel=True)
    # the batch really is jointly sharded: frames over (data, seq)
    assert sb.frames.sharding.spec == P("data", SEQ_AXIS)
    assert sb.token_ids.sharding.spec == P("data")
    out_c = fwd_c(params_c, consts, sb)
    out_1 = fwd_1(params, consts, shard_batch(batch, mesh_1))
    np.testing.assert_allclose(
        np.asarray(out_c["pred_boxes"]), np.asarray(out_1["pred_boxes"]),
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out_c["pred_sted"]), np.asarray(out_1["pred_sted"]),
        atol=1e-2,
    )

    # one full train step matches the single-device run
    def run(mesh, cfg_run):
        fresh = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), variables
        )
        tx, _ = make_optimizer(cfg_run, fresh["params"], num_training_steps=100)
        state = create_train_state(cfg_run, fresh, tx)
        step = make_train_step(cfg_run, model, tx, mesh, example_state=state)
        from stcat_tpu.core.mesh import shard_state as ss

        state = ss(state, mesh)
        sp = cfg_run.TPU.SEQUENCE_PARALLEL
        state, m = step(
            state,
            shard_batch(batch, mesh, sequence_parallel=sp),
            shard_batch(targets, mesh, sequence_parallel=sp),
            jax.random.PRNGKey(7),
        )
        return float(m["loss"]), state

    loss_c, state_c = run(mesh_c, cfg_c)
    loss_1, state_1 = run(mesh_1, cfg_1)
    np.testing.assert_allclose(loss_c, loss_1, rtol=2e-3, atol=2e-3)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state_c.params, state_1.params,
    )
    worst = max(jax.tree_util.tree_leaves(diffs))
    assert worst < 5e-3, f"max param divergence {worst}"
