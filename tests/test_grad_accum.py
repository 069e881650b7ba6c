"""Gradient accumulation (TPU.GRAD_ACCUM): the lax.scan'd microbatch step
must be numerically equivalent to the unaccumulated full-batch step.

Exactness argument (train/criterion.py docstring): every loss term is a mean
of per-clip reductions, and the box normalizer num_boxes is computed globally
before the split, so mean-over-microbatches of the per-microbatch losses (and
their gradients) equals the full-batch values in real arithmetic -- the tests
assert agreement to float32 tolerance. Dropout is disabled: the accumulated
step folds a distinct RNG per microbatch, so stochastic paths differ by
design.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stcat_tpu.core.mesh import make_mesh, shard_batch
from stcat_tpu.models import STCATNet
from stcat_tpu.train.optimizer import make_optimizer
from stcat_tpu.train.step import create_train_state, make_train_step

from helpers import make_batch_and_targets, tiny_cfg


def _no_dropout(extra=()):
    return tiny_cfg(
        (
            "MODEL.STCAT.DROPOUT", 0.0,
            "MODEL.STCAT.HEAD_DROPOUT", 0.0,
            "MODEL.TEXT_MODEL.DROPOUT", 0.0,
        )
        + tuple(extra)
    )


def _run_step(cfg, mesh, batch, targets, variables):
    model = STCATNet(cfg)
    tx, _ = make_optimizer(cfg, variables["params"], num_training_steps=10)
    state = create_train_state(cfg, variables, tx)
    step = make_train_step(cfg, model, tx, mesh)
    state, metrics = step(
        state, shard_batch(batch, mesh), shard_batch(targets, mesh),
        jax.random.PRNGKey(7),
    )
    return state, metrics


def _hetero_batch_and_targets(t=8):
    """4 clips with VARYING durations/spans (2 clips per flavor): with
    GRAD_ACCUM=2 the microbatches hold 8 vs 4 GT boxes, so a regression that
    recomputes num_boxes per microbatch (instead of using the global
    normalizer, train/criterion.py) actually changes the result -- uniform
    clips would mask it because per-microbatch and global normalizers
    coincide (advisor r4)."""
    b1, t1 = make_batch_and_targets(b=2, t=t, dur=t - 1, span=(2, 5), seed=0)
    b2, t2 = make_batch_and_targets(b=2, t=t, dur=t - 3, span=(1, 2), seed=1)
    cat = lambda *xs: jnp.concatenate(xs, axis=0)  # noqa: E731
    return (jax.tree_util.tree_map(cat, b1, b2),
            jax.tree_util.tree_map(cat, t1, t2))


@pytest.mark.slow  # ~110 s/param on the 1-core CI host: two full-step compiles
@pytest.mark.parametrize("accum", [2, 4])
def test_grad_accum_matches_full_batch(accum):
    cfg = _no_dropout()
    cfg_acc = _no_dropout(("TPU.GRAD_ACCUM", accum))
    mesh = make_mesh(1)
    batch, targets = _hetero_batch_and_targets(t=8)
    # precondition of the test's point: per-microbatch box counts differ
    n_boxes = np.asarray(targets.box_valid).reshape(accum, -1).sum(axis=1)
    assert len(set(n_boxes.tolist())) > 1, n_boxes
    model = STCATNet(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    s_full, m_full = _run_step(cfg, mesh, batch, targets, variables)
    s_acc, m_acc = _run_step(cfg_acc, mesh, batch, targets, variables)

    np.testing.assert_allclose(
        float(m_acc["loss"]), float(m_full["loss"]), rtol=2e-5
    )
    for k in m_full:
        np.testing.assert_allclose(
            float(m_acc[k]), float(m_full[k]), rtol=1e-4, atol=1e-6,
            err_msg=k,
        )
    flat_full = jax.tree_util.tree_leaves_with_path(s_full.params)
    flat_acc = dict(jax.tree_util.tree_leaves_with_path(s_acc.params))
    for path, leaf in flat_full:
        np.testing.assert_allclose(
            np.asarray(flat_acc[path]), np.asarray(leaf),
            rtol=5e-4, atol=1e-6, err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow  # ~3 min: two full-step compiles on the 8-device CPU mesh
def test_grad_accum_on_data_parallel_mesh():
    """accum=2 over an 8-clip batch sharded on the full 8-device mesh: the
    interleaved split keeps one row block per device and the loss matches
    the unaccumulated data-parallel step."""
    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    cfg = _no_dropout()
    cfg_acc = _no_dropout(("TPU.GRAD_ACCUM", 2))
    mesh = make_mesh(n)
    batch, targets = make_batch_and_targets(b=2 * n, t=8)
    model = STCATNet(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    _, m_full = _run_step(cfg, mesh, batch, targets, variables)
    _, m_acc = _run_step(cfg_acc, mesh, batch, targets, variables)
    np.testing.assert_allclose(
        float(m_acc["loss"]), float(m_full["loss"]), rtol=2e-5
    )


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_grad_accum_rejects_indivisible_batch():
    cfg = _no_dropout(("TPU.GRAD_ACCUM", 3))
    mesh = make_mesh(1)
    batch, targets = make_batch_and_targets(b=4, t=8)
    model = STCATNet(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError, match="GRAD_ACCUM"):
        _run_step(cfg, mesh, batch, targets, variables)
