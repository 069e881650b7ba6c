"""Checkpointing (orbax) + pretrained-weight converters.

Reference: utils/checkpoint.py (VSTGCheckpointer). Capabilities preserved:
  - periodic + final saves of {params, constants, ema_params, opt_state, step}
  - a `last_checkpoint` tag file enabling silent crash-resume: on restart the
    newest checkpoint overrides MODEL.WEIGHT and restores the iteration
    (ref checkpoint.py:68-103; the LR schedule is stateless in the step
    counter so no scheduler state is saved)
  - eval loads prefer the EMA weights (ref checkpoint.py:174-191)
  - pretrained-init importers: torchvision ResNet, HF RoBERTa, MDETR-style
    remaps, and full reference STCAT .pth checkpoints (ref
    checkpoint.py:122-172 _load_mdetr_weight)

Orbax writes are async-capable; on preemption-prone TPU pods the save is
atomic (tmp + rename semantics handled by orbax).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# ==========================================================================
# orbax save/load
# ==========================================================================

def _align_tree(template, got, path: str):
    """Validate a restored subtree against a fresh-init template: same dict
    structure, same leaf shapes; leaves cast to the template dtype."""
    if isinstance(template, dict):
        if not isinstance(got, dict):
            raise ValueError(f"checkpoint {path}: expected subtree, got leaf")
        missing = set(template) - set(got)
        extra = set(got) - set(template)
        if missing or extra:
            raise ValueError(
                f"checkpoint {path}: structure mismatch "
                f"(missing {sorted(missing)[:4]}, extra {sorted(extra)[:4]})"
            )
        return {k: _align_tree(template[k], got[k], f"{path}/{k}") for k in template}
    arr = np.asarray(got)
    tpl_shape = tuple(np.shape(template))
    if arr.shape != tpl_shape:
        raise ValueError(
            f"checkpoint {path}: shape {arr.shape} != expected {tpl_shape}"
        )
    tpl_dtype = getattr(template, "dtype", arr.dtype)
    return arr.astype(tpl_dtype)


class Checkpointer:
    def __init__(self, output_dir: str, logger=None, keep: int = 10):
        self.dir = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        self.logger = logger
        self.keep = keep
        os.makedirs(self.dir, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    _pending: Optional[int] = None

    def save(self, step: int, state, block: bool = False) -> None:
        """Start an ASYNC save: orbax copies device->host before returning
        (donation-safe -- the train step may reuse the state buffers
        immediately) and writes the multi-GB payload to disk on a background
        thread, so training resumes while the previous period serializes
        (the reference's torch.save blocks the loop, train_net.py:182-186).
        The `last_checkpoint` crash-resume tag is only written once the save
        COMMITS (flush), so a crash mid-write resumes from the previous
        complete checkpoint, never a half-written one."""
        self.flush()  # previous period must commit before its tag moves
        payload = {
            "params": state.params,
            "constants": state.constants,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
            "step": np.asarray(step),
        }
        self.mngr.save(step, args=self._ocp.args.StandardSave(payload))
        self._pending = step
        if self.logger:
            self.logger.info(f"Checkpoint {step}: device snapshot taken, "
                             "committing in background")
        if block:
            self.flush()

    def flush(self) -> None:
        """Wait for the in-flight save (if any) to commit, then publish its
        crash-resume tag. Cheap no-op when nothing is pending."""
        if self._pending is None:
            return
        self.mngr.wait_until_finished()
        step, self._pending = self._pending, None
        with open(os.path.join(self.dir, "last_checkpoint"), "w") as f:
            f.write(str(step))
        if self.logger:
            self.logger.info(f"Saved checkpoint at iteration {step}")

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.dir, "last_checkpoint"))

    def last_step(self) -> Optional[int]:
        p = os.path.join(self.dir, "last_checkpoint")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def restore(self, state, step: Optional[int] = None):
        """Restore a full TrainState (resume mode)."""
        step = self.last_step() if step is None else step
        assert step is not None, "no checkpoint to restore"
        template = {
            "params": state.params,
            "constants": state.constants,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
            "step": np.asarray(step),
        }
        restored = self.mngr.restore(
            step, args=self._ocp.args.StandardRestore(template)
        )
        return state.replace(
            step=jax.numpy.asarray(int(restored["step"])),
            params=restored["params"],
            constants=restored["constants"],
            opt_state=restored["opt_state"],
            ema_params=restored["ema_params"],
        ), int(restored["step"])

    def restore_for_eval(self, params, constants, step: Optional[int] = None):
        """Prefer EMA params (ref checkpoint.py:174-191).

        The raw saved tree is read without a full TrainState template (the
        optimizer-state structure differs between converted and trained
        checkpoints), then VALIDATED leaf-by-leaf against the caller's
        fresh-init params/constants: structure, shapes, and dtypes must
        line up, so an orbax round-trip quirk or a config/checkpoint
        mismatch fails loudly here instead of as garbage metrics."""
        step = self.last_step() if step is None else step
        restored = self.mngr.restore(step)
        chosen = (
            restored["ema_params"]
            if restored.get("ema_params") is not None
            else restored["params"]
        )
        return (
            _align_tree(params, chosen, "params"),
            _align_tree(constants, restored["constants"], "constants"),
        )


def load_weights_for_eval(cfg, params, constants, weight: str, logger=None):
    """Resolve MODEL.WEIGHT for inference (shared by cli/test.py and serve).

    Three modes, mirroring the reference's VSTGCheckpointer.load
    (utils/checkpoint.py:68-87, 174-191):
      - '' -> keep the caller's fresh-init trees;
      - *.pth/*.pt/*.bin -> torch checkpoint, converted in memory;
      - directory -> framework (orbax) checkpoint, EMA preferred.
    Returns (params, constants) as host trees.
    """
    if not weight:
        return params, constants
    if weight.endswith((".pth", ".pt", ".bin")):
        from .convert_reference import convert_reference_stcat

        sd = load_torch_file(weight)
        params, constants, unused = convert_reference_stcat(sd, cfg)
        if unused and logger is not None:
            logger.warning(f"{len(unused)} keys unconverted")
        if logger is not None:
            logger.info(f"converted torch weights from {weight}")
        return params, constants
    base = weight.rstrip("/")
    if base.endswith("checkpoints"):
        base = os.path.dirname(base)
    ckpt = Checkpointer(base, logger)
    params, constants = ckpt.restore_for_eval(params, constants)
    if logger is not None:
        logger.info(f"loaded weights from {weight} (EMA preferred)")
    return params, constants


# ==========================================================================
# torch-checkpoint converters (host-side, numpy only)
# ==========================================================================

def _t(x) -> np.ndarray:
    """torch tensor -> numpy (works without torch for ndarray inputs)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _fold_bn(sd: Dict, prefix: str, eps: float = 1e-5) -> Tuple[np.ndarray, np.ndarray]:
    """FrozenBatchNorm (w, b, mean, var) -> folded (scale, bias).

    Matches ref backbone.py:56-66: scale = w * rsqrt(var + eps),
    bias = b - mean * scale.
    """
    w = _t(sd[prefix + "weight"]).astype(np.float64)
    b = _t(sd[prefix + "bias"]).astype(np.float64)
    mean = _t(sd[prefix + "running_mean"]).astype(np.float64)
    var = _t(sd[prefix + "running_var"]).astype(np.float64)
    scale = w / np.sqrt(var + eps)
    bias = b - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _conv_kernel(x) -> np.ndarray:
    """torch conv [O, I, kH, kW] -> flax [kH, kW, I, O]."""
    return _t(x).transpose(2, 3, 1, 0)


def _dense(x) -> np.ndarray:
    """torch linear weight [O, I] -> flax kernel [I, O]."""
    return _t(x).T


def convert_torch_resnet(sd: Dict, depths, norm: str = "frozenbn") -> Tuple[Dict, Dict]:
    """torchvision ResNet state_dict -> (params, constants) for models.resnet.

    Handles both bare torchvision names (conv1, layer1.0.conv1, ...) and the
    reference's vis_encoder-prefixed names. norm="gn" (ref
    backbone.py:124-145 GroupNormBackbone) maps the GroupNorm affine
    (weight, bias) straight into trainable params -- GN normalizes
    activations at runtime, so there is nothing to fold and no constants."""
    params: Dict[str, Any] = {}
    constants: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    def put_norm(src_prefix: str, dst: Tuple[str, ...]):
        if norm == "gn":
            put(params, dst + ("scale",), _t(sd[src_prefix + "weight"]))
            put(params, dst + ("bias",), _t(sd[src_prefix + "bias"]))
        else:
            scale, bias = _fold_bn(sd, src_prefix)
            put(constants, dst + ("scale",), scale)
            put(constants, dst + ("bias",), bias)

    put(params, ("stem_conv", "kernel"), _conv_kernel(sd["conv1.weight"]))
    put_norm("bn1.", ("stem_bn",))

    for li, depth in enumerate(depths):
        for bi in range(depth):
            src = f"layer{li + 1}.{bi}."
            dst = f"layer{li + 1}_{bi}"
            for ci in (1, 2, 3):
                put(params, (dst, f"conv{ci}", "kernel"), _conv_kernel(sd[src + f"conv{ci}.weight"]))
                put_norm(src + f"bn{ci}.", (dst, f"bn{ci}"))
            if src + "downsample.0.weight" in sd:
                put(params, (dst, "ds_conv", "kernel"), _conv_kernel(sd[src + "downsample.0.weight"]))
                put_norm(src + "downsample.1.", (dst, "ds_bn"))
    return params, constants


def convert_torch_mha(sd: Dict, prefix: str = "") -> Dict:
    """torch nn.MultiheadAttention state_dict -> our MultiHeadAttention params.

    Splits the packed in_proj ([3D, D]) into q/k/v (ref modules use torch MHA
    throughout; the same split serves the full-checkpoint converter).
    """
    w = _t(sd[prefix + "in_proj_weight"])
    b = _t(sd[prefix + "in_proj_bias"])
    d = w.shape[1]
    return {
        "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
        "k_proj": {"kernel": w[d: 2 * d].T, "bias": b[d: 2 * d]},
        "v_proj": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "out_proj": {
            "kernel": _dense(sd[prefix + "out_proj.weight"]),
            "bias": _t(sd[prefix + "out_proj.bias"]),
        },
    }


def convert_hf_roberta(sd: Dict, num_layers: int = 12) -> Dict:
    """HF RobertaModel state_dict -> params for models.roberta.Roberta."""
    p: Dict[str, Any] = {}
    emb = "embeddings."
    p["word_embeddings"] = {"embedding": _t(sd[emb + "word_embeddings.weight"])}
    p["position_embeddings"] = {"embedding": _t(sd[emb + "position_embeddings.weight"])}
    p["token_type_embeddings"] = {"embedding": _t(sd[emb + "token_type_embeddings.weight"])}
    p["emb_ln"] = {
        "scale": _t(sd[emb + "LayerNorm.weight"]),
        "bias": _t(sd[emb + "LayerNorm.bias"]),
    }
    for i in range(num_layers):
        src = f"encoder.layer.{i}."
        attn = {
            "q_proj": {
                "kernel": _dense(sd[src + "attention.self.query.weight"]),
                "bias": _t(sd[src + "attention.self.query.bias"]),
            },
            "k_proj": {
                "kernel": _dense(sd[src + "attention.self.key.weight"]),
                "bias": _t(sd[src + "attention.self.key.bias"]),
            },
            "v_proj": {
                "kernel": _dense(sd[src + "attention.self.value.weight"]),
                "bias": _t(sd[src + "attention.self.value.bias"]),
            },
            "out_proj": {
                "kernel": _dense(sd[src + "attention.output.dense.weight"]),
                "bias": _t(sd[src + "attention.output.dense.bias"]),
            },
        }
        p[f"layer_{i}"] = {
            "attention": attn,
            "attn_ln": {
                "scale": _t(sd[src + "attention.output.LayerNorm.weight"]),
                "bias": _t(sd[src + "attention.output.LayerNorm.bias"]),
            },
            "intermediate": {
                "kernel": _dense(sd[src + "intermediate.dense.weight"]),
                "bias": _t(sd[src + "intermediate.dense.bias"]),
            },
            "output": {
                "kernel": _dense(sd[src + "output.dense.weight"]),
                "bias": _t(sd[src + "output.dense.bias"]),
            },
            "out_ln": {
                "scale": _t(sd[src + "output.LayerNorm.weight"]),
                "bias": _t(sd[src + "output.LayerNorm.bias"]),
            },
        }
    p["pooler"] = {
        "kernel": _dense(sd["pooler.dense.weight"]),
        "bias": _t(sd["pooler.dense.bias"]),
    }
    return p


def load_torch_file(path: str) -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return ckpt
