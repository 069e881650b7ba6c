"""Tensor (model) parallelism: Megatron-style head/FFN sharding over a 2-D
(data, model) mesh (cfg.TPU.MODEL_PARALLEL). The reference has no equivalent
(DDP only, scripts/train_net.py:282-284); this is the TPU-native scaling axis
for configs whose activations outgrow one chip. Outputs, losses, and the
updated state must match the replicated data-parallel run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from stcat_tpu.core.mesh import (
    MODEL_AXIS,
    make_mesh,
    shard_batch,
    shard_state,
    state_shardings,
)
from stcat_tpu.models import STCATNet
from stcat_tpu.train.optimizer import make_optimizer
from stcat_tpu.train.step import create_train_state, make_eval_forward, make_train_step
from helpers import make_batch_and_targets, tiny_cfg


def _tp_cfg(extra=()):
    return tiny_cfg(["TPU.MODEL_PARALLEL", 2] + list(extra))


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_param_partition_rules():
    """Column/row rules land on the right leaves, incl. optimizer state."""
    cfg = _tp_cfg()
    model = STCATNet(cfg)
    batch, _ = make_batch_and_targets(b=1, t=8)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch)
    mesh = make_mesh(8, model_parallel=2)
    sh = state_shardings(variables, mesh)

    p = sh["params"]
    # column-parallel: attention input projections + FFN up
    assert p["decoder"]["layer_0"]["self_attn"]["q_proj"]["kernel"].spec == P(None, MODEL_AXIS)
    assert p["decoder"]["layer_0"]["sa_qcontent_proj"]["kernel"].spec == P(None, MODEL_AXIS)
    assert p["decoder"]["layer_0"]["ca_qpos_sine_proj"]["kernel"].spec == P(None, MODEL_AXIS)
    assert p["ground_encoder"]["spatial_0"]["linear1"]["kernel"].spec == P(None, MODEL_AXIS)
    assert p["ground_encoder"]["spatial_0"]["linear1"]["bias"].spec == P(MODEL_AXIS)
    assert p["text_encoder"]["roberta"]["layer_0"]["intermediate"]["kernel"].spec == P(None, MODEL_AXIS)
    # row-parallel: attention out + FFN down; bias replicated
    assert p["decoder"]["layer_0"]["cross_attn"]["out_proj"]["kernel"].spec == P(MODEL_AXIS, None)
    assert p["ground_encoder"]["spatial_0"]["linear2"]["kernel"].spec == P(MODEL_AXIS, None)
    assert p["ground_encoder"]["spatial_0"]["linear2"]["bias"].spec == P()
    assert p["text_encoder"]["roberta"]["layer_0"]["output"]["kernel"].spec == P(MODEL_AXIS, None)
    # replicated: convs, norms, embeddings, heads
    assert p["vis_encoder"]["layer3_0"]["conv2"]["kernel"].spec == P()
    assert p["bbox_embed"]["layer_0"]["kernel"].spec == P()
    assert p["text_encoder"]["roberta"]["word_embeddings"]["embedding"].spec == P()
    assert sh["constants"]["vis_encoder"]["stem_bn"]["scale"].spec == P()

    # optimizer state inherits the param's spec (path-suffix matching)
    variables_c = model.init(jax.random.PRNGKey(0), batch)
    tx, _ = make_optimizer(cfg, variables_c["params"], num_training_steps=10)
    state = create_train_state(cfg, variables_c, tx)
    st_sh = state_shardings(state, mesh)
    leaves = jax.tree_util.tree_flatten_with_path(st_sh.opt_state)[0]
    q_proj_mu = [
        s for path, s in leaves
        if "q_proj" in jax.tree_util.keystr(path)
        and jax.tree_util.keystr(path).endswith("['kernel']")
    ]
    assert q_proj_mu and all(s.spec == P(None, MODEL_AXIS) for s in q_proj_mu)
    assert st_sh.step.spec == P()


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_tp_forward_matches_replicated():
    cfg = _tp_cfg()
    model = STCATNet(cfg)
    batch, _ = make_batch_and_targets(b=4, t=8, dur=7)
    variables = model.init(jax.random.PRNGKey(0), batch)
    params, consts = variables["params"], variables.get("constants", {})

    mesh_tp = make_mesh(8, model_parallel=2)   # (data=4, model=2)
    mesh_1 = make_mesh(1)
    fwd_tp = make_eval_forward(cfg, model, mesh_tp, example_params=params)
    fwd_1 = make_eval_forward(tiny_cfg(), model, mesh_1)

    out_tp = fwd_tp(params, consts, shard_batch(batch, mesh_tp))
    out_1 = fwd_1(params, consts, shard_batch(batch, mesh_1))
    # different partitionings accumulate different rounding; the decoder's
    # inverse_sigmoid chain amplifies it (same tolerance as the SP test)
    np.testing.assert_allclose(
        np.asarray(out_tp["pred_boxes"]), np.asarray(out_1["pred_boxes"]), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_tp["pred_sted"]), np.asarray(out_1["pred_sted"]), atol=1e-2
    )


@pytest.mark.slow  # ~145 s: tp and dp train-step compiles; tp forward parity above is the fast gate
def test_tp_train_step_matches_data_parallel():
    cfg = _tp_cfg()
    model = STCATNet(cfg)
    batch, targets = make_batch_and_targets(b=4, t=8, dur=7)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(7)

    def run(mesh, cfg_run, n_steps=2):
        # fresh buffers per run: the donated step invalidates its input state,
        # and on CPU a replicating device_put aliases the device-0 shard, so
        # sharing `variables` across runs would hand run 2 deleted arrays
        fresh = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), variables)
        tx, _ = make_optimizer(cfg_run, fresh["params"], num_training_steps=100)
        state = create_train_state(cfg_run, fresh, tx)
        step = make_train_step(cfg_run, model, tx, mesh, example_state=state)
        state = shard_state(state, mesh)
        sb = shard_batch(batch, mesh)
        st = shard_batch(targets, mesh)
        losses = []
        for _ in range(n_steps):
            state, m = step(state, sb, st, rng)
            losses.append(float(m["loss"]))
        return losses, state

    losses_tp, state_tp = run(make_mesh(8, model_parallel=2), cfg)
    losses_dp, state_dp = run(make_mesh(4), tiny_cfg())

    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-3, atol=2e-3)
    # the updated params must agree leaf-by-leaf (gather the TP shards)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state_tp.params,
        state_dp.params,
    )
    worst = max(jax.tree_util.tree_leaves(diffs))
    assert worst < 5e-3, f"max param divergence {worst}"

    # the TP run really sharded: a column-parallel kernel lives split over
    # the model axis
    k = state_tp.params["decoder"]["layer_0"]["self_attn"]["q_proj"]["kernel"]
    assert k.sharding.spec == P(None, MODEL_AXIS)


def test_tp_validation_rejects_indivisible_heads():
    cfg = tiny_cfg(["TPU.MODEL_PARALLEL", 4])  # text heads = 2, not divisible
    model = STCATNet(cfg)
    batch, _ = make_batch_and_targets(b=1, t=8)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch)
    mesh = make_mesh(8, model_parallel=4)
    tx, _ = make_optimizer(
        cfg, jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), variables["params"]),
        num_training_steps=10,
    )
    state = create_train_state(
        cfg,
        jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), variables),
        tx,
    )
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        make_train_step(cfg, model, tx, mesh, example_state=state)
