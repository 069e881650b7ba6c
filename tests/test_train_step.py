"""Train-step tests: loss decreases, DP equivalence on the 8-device mesh,
LR schedule parity with the reference formula, EMA."""

from bisect import bisect_right

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stcat_tpu.core.mesh import make_mesh, replicate, shard_batch
from stcat_tpu.models import STCATNet
from stcat_tpu.train.optimizer import current_lrs, ema_update, label_params, make_optimizer
from stcat_tpu.train.step import create_train_state, make_eval_forward, make_train_step
from helpers import make_batch_and_targets, tiny_cfg


def build_everything(cfg, mesh, b, t=8):
    model = STCATNet(cfg)
    batch, targets = make_batch_and_targets(b=b, t=t)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tx, labels = make_optimizer(cfg, variables["params"], num_training_steps=100)
    state = create_train_state(cfg, variables, tx)
    return model, state, tx, batch, targets, labels


class TestLabels:
    def test_group_assignment(self):
        cfg = tiny_cfg()
        model = STCATNet(cfg)
        batch, _ = make_batch_and_targets(t=4, h=32, w=32)
        variables = model.init(jax.random.PRNGKey(0), batch)
        labels = label_params(cfg, variables["params"])
        flat = {
            "/".join(str(k.key) for k in path): v
            for path, v in jax.tree_util.tree_flatten_with_path(labels)[0]
        }
        assert any(v == "frozen" and "stem" in k for k, v in flat.items())
        assert any(v == "frozen" and "layer1_" in k for k, v in flat.items())
        assert all(v == "vis" for k, v in flat.items() if "layer3_" in k)
        assert all(v == "text" for k, v in flat.items() if k.startswith("text_encoder"))
        assert all(v == "temp" for k, v in flat.items() if k.startswith("temp_decoder"))
        assert flat["bbox_embed/layer_0/kernel"] == "rest"

    def test_frozen_text_body_keeps_resizer_trainable(self):
        """ref bert.py:48-50 freezes only the roberta BODY; the resizer keeps
        requires_grad and stays in the text LR group."""
        cfg = tiny_cfg(["MODEL.TEXT_MODEL.FREEZE", "true"])
        model = STCATNet(cfg)
        batch, _ = make_batch_and_targets(t=4, h=32, w=32)
        variables = model.init(jax.random.PRNGKey(0), batch)
        labels = label_params(cfg, variables["params"])
        flat = {
            "/".join(str(k.key) for k in path): v
            for path, v in jax.tree_util.tree_flatten_with_path(labels)[0]
        }
        assert all(v == "frozen" for k, v in flat.items()
                   if k.startswith("text_encoder/roberta"))
        assert all(v == "text" for k, v in flat.items()
                   if k.startswith("text_encoder/resizer"))


class TestSchedules:
    def ref_gammas(self, cfg, curr_step, num_training_steps):
        """Direct transcription of ref engine/lr_scheduler.py:212-252."""
        num_warmup_steps = round(cfg.SOLVER.WARMUP_PROP * num_training_steps)
        iter_per_epoch = round(num_training_steps / cfg.SOLVER.MAX_EPOCH)
        now_epoch = curr_step // iter_per_epoch
        drop_step = list(cfg.SOLVER.SCHEDULE.DROP_STEP)
        if cfg.SOLVER.SCHEDULE.TYPE == "multistep_with_warmup":
            gamma = 0.1 ** bisect_right(drop_step, now_epoch)
            if curr_step < num_warmup_steps:
                text_gamma = float(curr_step) / float(max(1, num_warmup_steps))
            else:
                text_gamma = max(
                    0.0,
                    float(num_training_steps - curr_step)
                    / float(max(1, num_training_steps - num_warmup_steps)),
                )
            return gamma, gamma, text_gamma, text_gamma
        else:
            if curr_step < num_warmup_steps:
                gamma = float(curr_step) / float(max(1, num_warmup_steps))
            else:
                gamma = 0.1 ** bisect_right(drop_step, now_epoch)
            return gamma, gamma, gamma, gamma

    @pytest.mark.parametrize("stype", ["multistep_with_warmup", "multistep_with_warmup_all"])
    def test_schedule_matches_reference(self, stype):
        cfg = tiny_cfg([
            "SOLVER.SCHEDULE.TYPE", stype,
            "SOLVER.SCHEDULE.DROP_STEP", "[8,10]",
            "SOLVER.MAX_EPOCH", 20,
            "SOLVER.WARMUP_PROP", 0.05,
            "SOLVER.BASE_LR", 1e-4,
            "SOLVER.VIS_BACKBONE_LR", 1e-5,
            "SOLVER.TEXT_LR", 5e-5,
            "SOLVER.TEMP_LR", 1e-4,
        ])
        n = 1000
        at = current_lrs(cfg, n)
        for step in [0, 1, 25, 49, 50, 51, 400, 401, 449, 500, 550, 999]:
            g_rest, g_vis, g_text, g_temp = self.ref_gammas(cfg, step, n)
            lrs = at(step)
            np.testing.assert_allclose(lrs["rest"], 1e-4 * g_rest, rtol=1e-5, err_msg=f"step {step}")
            np.testing.assert_allclose(lrs["vis"], 1e-5 * g_vis, rtol=1e-5)
            np.testing.assert_allclose(lrs["text"], 5e-5 * g_text, rtol=1e-5)
            np.testing.assert_allclose(lrs["temp"], 1e-4 * g_temp, rtol=1e-5)


def test_ema_update_formula():
    ema = {"w": jnp.asarray(1.0)}
    cur = {"w": jnp.asarray(0.0)}
    out = ema_update(ema, cur, 0.9)
    np.testing.assert_allclose(float(out["w"]), 0.9)


class TestTrainStep:
    @pytest.mark.slow  # ~170 s: 8-device dp step + single-device reference run
    def test_loss_decreases_and_dp_matches_single_device(self):
        cfg = tiny_cfg(["SOLVER.BASE_LR", 1e-3, "SOLVER.TEMP_LR", 1e-3,
                        "SOLVER.WARMUP_PROP", 0.0])
        # --- 8-device data parallel, 8 identical clips ---
        mesh8 = make_mesh(8)
        model, state8, tx, batch1, targets1, _ = build_everything(cfg, mesh8, b=1)
        batch8 = jax.tree_util.tree_map(lambda x: jnp.repeat(x, 8, axis=0), batch1)
        targets8 = jax.tree_util.tree_map(lambda x: jnp.repeat(x, 8, axis=0), targets1)
        step8 = make_train_step(cfg, model, tx, mesh8)
        batch8 = shard_batch(batch8, mesh8)
        targets8 = shard_batch(targets8, mesh8)

        rng = jax.random.PRNGKey(7)
        state8, m8_first = step8(state8, batch8, targets8, rng)
        metrics_hist = [float(m8_first["loss"])]
        for i in range(4):
            state8, m = step8(state8, batch8, targets8, rng)
            metrics_hist.append(float(m["loss"]))
        assert metrics_hist[-1] < metrics_hist[0], metrics_hist

        # --- single device, same clip, same rng stream per-device? ---
        # dropout rngs differ per device index; for exact equality run the
        # 1-device mesh which folds in index 0, and compare to an 8-device
        # run where all clips are identical: the pmean'd loss must equal the
        # single-device loss at step 1 (identical params, identical data,
        # but different per-device dropout). Use deterministic-friendly
        # comparison: dropout off via eval forward.
        mesh1 = make_mesh(1)
        fwd8 = make_eval_forward(cfg, model, mesh8)
        fwd1 = make_eval_forward(cfg, model, mesh1)
        variables = model.init(jax.random.PRNGKey(0), batch1)
        out8 = fwd8(variables["params"], variables.get("constants", {}), batch8)
        out1 = fwd1(variables["params"], variables.get("constants", {}),
                    shard_batch(batch1, mesh1))
        # all 8 replica outputs must be bitwise identical (deterministic DP)
        a8 = np.asarray(out8["pred_boxes"])
        np.testing.assert_array_equal(a8, np.tile(a8[:1], (8, 1, 1)))
        # 8-dev vs 1-dev are DIFFERENT XLA programs; fusion-order float
        # variance gets amplified by inverse_sigmoid across decoder layers,
        # so only loose agreement is guaranteed (measured ~2e-3).
        np.testing.assert_allclose(
            a8[0], np.asarray(out1["pred_boxes"])[0], atol=1e-2,
        )

    @pytest.mark.slow  # ~75 s: full train-step compile just to read frozen leaves
    def test_frozen_params_unchanged(self):
        cfg = tiny_cfg(["SOLVER.BASE_LR", 1e-3, "SOLVER.WARMUP_PROP", 0.0])
        mesh = make_mesh(8)
        model, state, tx, batch1, targets1, labels = build_everything(cfg, mesh, b=1)
        batch = shard_batch(jax.tree_util.tree_map(lambda x: jnp.repeat(x, 8, 0), batch1), mesh)
        targets = shard_batch(jax.tree_util.tree_map(lambda x: jnp.repeat(x, 8, 0), targets1), mesh)
        step = make_train_step(cfg, model, tx, mesh)

        stem_before = np.asarray(state.params["vis_encoder"]["stem_conv"]["kernel"])
        rest_before = np.asarray(state.params["bbox_embed"]["layer_0"]["kernel"])
        ema_before = np.asarray(state.ema_params["bbox_embed"]["layer_0"]["kernel"])
        state, _ = step(state, batch, targets, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(
            np.asarray(state.params["vis_encoder"]["stem_conv"]["kernel"]), stem_before
        )
        assert not np.allclose(
            np.asarray(state.params["bbox_embed"]["layer_0"]["kernel"]), rest_before
        )
        # EMA moved a tiny bit toward the new params
        ema_after = np.asarray(state.ema_params["bbox_embed"]["layer_0"]["kernel"])
        assert not np.array_equal(ema_after, ema_before)
        assert np.abs(ema_after - ema_before).max() < np.abs(
            np.asarray(state.params["bbox_embed"]["layer_0"]["kernel"]) - rest_before
        ).max()


class TestTorchOptimizerParity:
    """make_optimizer == torch per-group optim, value-for-value over steps.

    Covers: per-group LR schedules applied each step (ref
    engine/lr_scheduler.py adjust_learning_rate mutates group lr before
    every step), grad clipping over TRAINABLE params only (torch
    clip_grad_norm_ skips grad=None frozen params -- the frozen leaf here
    gets a huge gradient that must NOT inflate the clip norm), weight decay
    placement, and momentum/adam accumulator ordering.
    """

    def _fake_params(self, rng):
        return {
            "vis_encoder": {
                "stem_conv": {"kernel": jnp.asarray(rng.randn(3, 3).astype(np.float32))},
                "layer3_0": {"kernel": jnp.asarray(rng.randn(4, 2).astype(np.float32))},
            },
            "text_encoder": {"proj": {"kernel": jnp.asarray(rng.randn(2, 5).astype(np.float32))}},
            "temp_decoder": {"w": jnp.asarray(rng.randn(6).astype(np.float32))},
            "bbox_embed": {"w": jnp.asarray(rng.randn(3).astype(np.float32))},
        }

    def _run_pair(self, optimizer_name, n_steps=8):
        import torch

        from stcat_tpu.train.optimizer import current_lrs

        cfg = tiny_cfg([
            "SOLVER.OPTIMIZER", optimizer_name,
            "SOLVER.BASE_LR", 1e-2,
            "SOLVER.VIS_BACKBONE_LR", 1e-3,
            "SOLVER.TEXT_LR", 5e-3,
            "SOLVER.TEMP_LR", 2e-2,
            "SOLVER.WEIGHT_DECAY", 1e-4,
            "SOLVER.MOMENTUM", 0.9,
            "SOLVER.MAX_GRAD_NORM", 0.1,
            "SOLVER.SCHEDULE.TYPE", "multistep_with_warmup_all",
            "SOLVER.SCHEDULE.DROP_STEP", "[1,3]",
            "SOLVER.MAX_EPOCH", 4,
            "SOLVER.WARMUP_PROP", 0.25,
        ])
        rng = np.random.RandomState(0)
        params = self._fake_params(rng)
        n_train = n_steps
        tx, labels = make_optimizer(cfg, params, num_training_steps=n_train)
        lrs_at = current_lrs(cfg, n_train)
        state = tx.init(params)

        # torch mirror: frozen stem not registered; groups get lr set per step
        tp = jax.tree_util.tree_map(
            lambda x: torch.nn.Parameter(torch.tensor(np.asarray(x))), params
        )
        groups = {
            "vis": [tp["vis_encoder"]["layer3_0"]["kernel"]],
            "text": [tp["text_encoder"]["proj"]["kernel"]],
            "temp": [tp["temp_decoder"]["w"]],
            "rest": [tp["bbox_embed"]["w"]],
        }
        kw = dict(weight_decay=1e-4)
        if optimizer_name == "sgd":
            opt = torch.optim.SGD([{"params": v, "lr": 0.0, "name": k} for k, v in groups.items()],
                                  momentum=0.9, **kw)
        elif optimizer_name == "rmsprop":
            opt = torch.optim.RMSprop([{"params": v, "lr": 0.0, "name": k} for k, v in groups.items()], **kw)
        elif optimizer_name == "adamw":
            opt = torch.optim.AdamW([{"params": v, "lr": 0.0, "name": k} for k, v in groups.items()], **kw)
        elif optimizer_name == "adam":
            opt = torch.optim.Adam([{"params": v, "lr": 0.0, "name": k} for k, v in groups.items()], **kw)
        else:
            raise ValueError(optimizer_name)
        trainable = [p for v in groups.values() for p in v]

        grads_per_step = [self._fake_params(np.random.RandomState(100 + s)) for s in range(n_steps)]
        # make the frozen leaf's grad enormous: must not affect the clip norm
        for g in grads_per_step:
            g["vis_encoder"]["stem_conv"]["kernel"] = g["vis_encoder"]["stem_conv"]["kernel"] * 1e6

        for s in range(n_steps):
            grads = grads_per_step[s]
            updates, state = tx.update(grads, state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

            lrs = lrs_at(s)
            for gdict in opt.param_groups:
                gdict["lr"] = lrs[gdict["name"]]
            opt.zero_grad()
            tp["vis_encoder"]["layer3_0"]["kernel"].grad = torch.tensor(
                np.asarray(grads["vis_encoder"]["layer3_0"]["kernel"]))
            tp["text_encoder"]["proj"]["kernel"].grad = torch.tensor(
                np.asarray(grads["text_encoder"]["proj"]["kernel"]))
            tp["temp_decoder"]["w"].grad = torch.tensor(np.asarray(grads["temp_decoder"]["w"]))
            tp["bbox_embed"]["w"].grad = torch.tensor(np.asarray(grads["bbox_embed"]["w"]))
            torch.nn.utils.clip_grad_norm_(trainable, 0.1)
            opt.step()

        flat_ours, _ = jax.tree_util.tree_flatten(params)
        flat_torch, _ = jax.tree_util.tree_flatten(
            jax.tree_util.tree_map(lambda p: p.detach().numpy(), tp))
        for a, b in zip(flat_ours, flat_torch):
            np.testing.assert_allclose(np.asarray(a), b, rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize("name", ["sgd", "adamw", "adam", "rmsprop"])
    def test_matches_torch(self, name):
        self._run_pair(name)
