"""Full-model golden parity: our STCATNet vs the PyTorch reference.

Builds the ACTUAL reference model (models/pipeline.py:12-121) on CPU at a
small-but-shape-consistent config (d_model must be 256: the reference
hardcodes 128 sine feats per anchor coord and ref_point_head takes
2*d_model, net_utils.py:34 + query_decoder.py:163), converts its
state_dict with convert_reference_stcat, and asserts fp32 output parity of
pred_boxes / pred_sted / weights / pred_actioness and every aux layer.

This covers, end-to-end and numerically, the composite risks called out in
round-1 review: anchor-sine channel order, layer-0 ca_qpos_proj and
pos_transformation=1 specials, per-head concat interleave in the
projection-free cross-attention, the FiLM TemplateGenerator, and post-LN
encoder ordering (query_decoder.py:150-438, modal_encoder.py:104-242).
"""

import os
import sys

import numpy as np
import pytest

import ref_harness

ref_harness.install_stubs()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stcat_tpu.config import default_config, merge_from_list  # noqa: E402
from stcat_tpu.core.batch import VideoBatch  # noqa: E402
from stcat_tpu.models import STCATNet  # noqa: E402
from stcat_tpu.train.convert_reference import convert_reference_stcat  # noqa: E402

T, H, W, L = 6, 64, 64, 7
VOCAB = 128


def _our_cfg(from_scratch, pos_enc="sine", learn_time_embed=False,
             compute_dtype="float32"):
    return merge_from_list(default_config(), [
        "TPU.COMPUTE_DTYPE", compute_dtype,
        "MODEL.VISION_BACKBONE.POS_ENC", pos_enc,
        "MODEL.STCAT.USE_LEARN_TIME_EMBED", "true" if learn_time_embed else "false",
        "MODEL.VISION_BACKBONE.NAME", "resnet50",
        "MODEL.VISION_BACKBONE.DEPTHS", "[1,1,1,1]",
        "MODEL.STCAT.ENC_LAYERS", 2,
        "MODEL.STCAT.DEC_LAYERS", 2,
        "MODEL.STCAT.HIDDEN", 256,
        "MODEL.STCAT.HEADS", 8,
        "MODEL.STCAT.FFN_DIM", 256,
        "MODEL.STCAT.DROPOUT", 0.0,
        "MODEL.STCAT.FROM_SCRATCH", "true" if from_scratch else "false",
        "MODEL.TEXT_MODEL.VOCAB_SIZE", VOCAB,
        "MODEL.TEXT_MODEL.HIDDEN", 32,
        "MODEL.TEXT_MODEL.LAYERS", 2,
        "MODEL.TEXT_MODEL.HEADS", 2,
        "MODEL.TEXT_MODEL.INTERMEDIATE", 64,
        "MODEL.TEXT_MODEL.MAX_POS", 64,
        "INPUT.MAX_VIDEO_LEN", 32,
        "TPU.REMAT_BACKBONE", "false",
    ])


def _hf_config():
    import transformers

    return transformers.RobertaConfig(
        vocab_size=VOCAB, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=1, pad_token_id=1,
    )


def _flat_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flat_paths(v, p))
        else:
            out[p] = tuple(v.shape) if hasattr(v, "shape") else np.asarray(v).shape
    return out


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(42)
    frames = rng.randn(T, 3, H, W).astype(np.float32) * 0.4
    ids = rng.randint(3, VOCAB, size=(1, L)).astype(np.int64)
    return frames, ids


def _build_pair(monkeypatch, inputs, from_scratch, pos_enc="sine",
                learn_time_embed=False, compute_dtype="float32"):
    frames, ids = inputs
    tokenizer = ref_harness.FakeTokenizer(ids, np.ones_like(ids))
    ref_harness.patch_text_encoder(monkeypatch, _hf_config(), tokenizer)

    from models.pipeline import STCATNet as RefSTCATNet
    from utils.misc import NestedTensor

    torch.manual_seed(0)
    ref_cfg = ref_harness.make_ref_cfg(
        from_scratch=from_scratch, pos_enc=pos_enc,
        learn_time_embed=learn_time_embed,
    )
    ref_model = RefSTCATNet(ref_cfg).eval()
    ref_harness.randomize_frozen_bn(ref_model)

    videos = NestedTensor(
        torch.tensor(frames),
        torch.zeros((T, H, W), dtype=torch.bool),
        [T],
    )
    with torch.no_grad():
        ref_out = ref_model(videos, ["a golden parity clip"])

    cfg = _our_cfg(from_scratch, pos_enc=pos_enc,
                   learn_time_embed=learn_time_embed,
                   compute_dtype=compute_dtype)
    model = STCATNet(cfg)
    batch = VideoBatch(
        frames=jnp.asarray(frames.transpose(0, 2, 3, 1)[None]),  # [1,T,H,W,3]
        frame_valid=jnp.ones((1, T), bool),
        pixel_valid=jnp.ones((1, T, H, W), bool),
        token_ids=jnp.asarray(ids, jnp.int32),
        token_valid=jnp.ones((1, L), bool),
    )
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch)
    params, constants, unused = convert_reference_stcat(
        ref_model.state_dict(), cfg
    )
    assert not unused, f"unconverted reference keys: {sorted(unused)[:10]}"

    tpl_paths = _flat_paths(jax.tree_util.tree_map(lambda x: x, template["params"]))
    got_paths = _flat_paths(params)
    assert tpl_paths == got_paths, (
        f"missing: {sorted(set(tpl_paths) - set(got_paths))[:8]} "
        f"extra: {sorted(set(got_paths) - set(tpl_paths))[:8]} "
        f"shape diffs: "
        f"{[(k, tpl_paths[k], got_paths[k]) for k in tpl_paths if k in got_paths and tpl_paths[k] != got_paths[k]][:8]}"
    )

    ours = model.apply(
        {"params": params, "constants": constants}, batch, deterministic=True
    )
    return ref_out, ours


def _assert_close(ref_t, ours_a, name, atol=2e-4, rtol=1e-3):
    np.testing.assert_allclose(
        np.asarray(ours_a), ref_t.detach().numpy(), atol=atol, rtol=rtol,
        err_msg=name,
    )


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_full_model_parity_learned_embeddings(monkeypatch, inputs):
    """Learned 2-D position embedding (vis_encoder.1.*) + learned query-time
    table (ground_decoder.time_embed.embed) must also convert exactly."""
    ref_out, ours = _build_pair(monkeypatch, inputs, True, pos_enc="learned",
                                learn_time_embed=True)
    _assert_close(ref_out["pred_boxes"].reshape(1, T, 4), ours["pred_boxes"],
                  "pred_boxes")
    _assert_close(ref_out["pred_sted"], ours["pred_sted"], "pred_sted")


@pytest.mark.parametrize("from_scratch", [True, False])
def test_full_model_parity(monkeypatch, inputs, from_scratch):
    ref_out, ours = _build_pair(monkeypatch, inputs, from_scratch)

    _assert_close(ref_out["pred_boxes"].reshape(1, T, 4), ours["pred_boxes"],
                  "pred_boxes")
    _assert_close(ref_out["pred_sted"], ours["pred_sted"], "pred_sted")
    _assert_close(ref_out["weights"], ours["weights"], "weights")
    _assert_close(ref_out["pred_actioness"], ours["pred_actioness"],
                  "pred_actioness")
    assert len(ref_out["aux_outputs"]) == len(ours["aux_outputs"])
    for i, (ra, oa) in enumerate(zip(ref_out["aux_outputs"], ours["aux_outputs"])):
        _assert_close(ra["pred_boxes"].reshape(1, T, 4), oa["pred_boxes"],
                      f"aux{i}.pred_boxes")
        _assert_close(ra["pred_sted"], oa["pred_sted"], f"aux{i}.pred_sted")
        _assert_close(ra["weights"], oa["weights"], f"aux{i}.weights")
        _assert_close(ra["pred_actioness"], oa["pred_actioness"],
                      f"aux{i}.pred_actioness")


def test_full_model_parity_bf16_tolerance(monkeypatch, inputs):
    """bf16 drift pin at the converted-checkpoint level (verdict r4 task 2).

    The reference runs fp32 end-to-end (scripts/train_net.py -- no AMP in
    the repo); the production TPU path computes in bf16 over fp32 params
    (TPU.COMPUTE_DTYPE). This asserts the bf16 forward of CONVERTED
    reference weights stays within a pinned envelope of the fp32 torch
    golden outputs -- pred_boxes are normalized cxcywh in [0,1], so atol is
    directly in box-coordinate units (measured max |drift| ~6e-3 at this
    depth; pinned at 2x). Metric-level drift is measured by
    tests/test_learning.py::test_overfit_moves_m_viou (fp32-trained params
    re-evaluated under bf16 compute) and tabulated in docs/STATUS.md.
    """
    ref_out, ours = _build_pair(monkeypatch, inputs, True,
                                compute_dtype="bfloat16")
    np.testing.assert_allclose(
        np.asarray(ours["pred_boxes"], np.float32),
        ref_out["pred_boxes"].reshape(1, T, 4).detach().numpy(),
        atol=1.5e-2, rtol=0.0, err_msg="pred_boxes bf16 drift",
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_sted"], np.float32),
        ref_out["pred_sted"].detach().numpy(),
        atol=8e-2, rtol=0.0, err_msg="pred_sted bf16 drift",
    )
    # report the observed drift for the STATUS table
    db = float(np.max(np.abs(
        np.asarray(ours["pred_boxes"], np.float32)
        - ref_out["pred_boxes"].reshape(1, T, 4).detach().numpy())))
    ds = float(np.max(np.abs(
        np.asarray(ours["pred_sted"], np.float32)
        - ref_out["pred_sted"].detach().numpy())))
    print(f"bf16 drift: max|pred_boxes|={db:.2e} max|pred_sted|={ds:.2e}")
