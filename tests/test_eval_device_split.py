"""TPU.EVAL_DEVICE_SPLIT: the on-device even/odd split + stream stacking
(core/batch.device_split_streams) must be value-identical to the host numpy
path (subsample_stream + stack_streams, ref utils/misc.py:55-65), and a full
do_eval pass must produce identical metrics either way.
"""

import numpy as np
import pytest

import jax

from stcat_tpu.core.batch import (
    device_split_streams,
    stack_streams,
    subsample_stream,
)

from helpers import make_batch_and_targets, tiny_cfg


def _assert_batches_equal(a, b):
    import dataclasses

    for f in dataclasses.fields(a):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if not hasattr(va, "ndim"):
            assert va == vb, f.name
            continue
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=f.name
        )


@pytest.mark.parametrize("t", [8, 9])  # even and odd frame counts
def test_device_split_matches_host_videobatch(t):
    batch, _ = make_batch_and_targets(b=2, t=t, dur=t - 1)
    host = stack_streams(subsample_stream(batch, 0), subsample_stream(batch, 1))
    dev = jax.jit(device_split_streams)(batch)
    _assert_batches_equal(host, dev)


@pytest.mark.parametrize("yuv", [False, True])
def test_device_split_matches_host_rawbatch(yuv):
    from __graft_entry__ import _make_raw_batch

    raw = _make_raw_batch(b=2, t=8, hs=32, ws=32, out_hw=(16, 16), yuv=yuv)
    host = stack_streams(subsample_stream(raw, 0), subsample_stream(raw, 1))
    dev = jax.jit(device_split_streams)(raw)
    _assert_batches_equal(host, dev)


@pytest.mark.slow  # jits the tiny model twice (host-split + device-split)
def test_do_eval_metrics_identical(tmp_path):
    from stcat_tpu.config import merge_from_list
    from stcat_tpu.core.mesh import make_mesh
    from stcat_tpu.data.datasets import VidSTGDataset
    from stcat_tpu.data.loader import Loader
    from stcat_tpu.data.synthetic import (
        materialize_frame_corpus, write_synthetic_cache,
    )
    from stcat_tpu.eval import build_evaluator
    from stcat_tpu.eval.engine import do_eval
    from stcat_tpu.models import STCATNet
    from stcat_tpu.train.step import init_variables, make_eval_forward

    base = tiny_cfg(("DATA_DIR", str(tmp_path), "DATASET.NAME", "VidSTG",
                     "DATALOADER.NUM_WORKERS", "1"))
    write_synthetic_cache(str(tmp_path), "VidSTG", "test", n_items=4, n_frames=10)
    materialize_frame_corpus(str(tmp_path), "VidSTG", "test")

    mesh = make_mesh(1)
    results = {}
    for split_on in (False, True):
        cfg = merge_from_list(
            base, ["TPU.EVAL_DEVICE_SPLIT", str(split_on).lower()]
        )
        ds = VidSTGDataset(cfg, "test")
        loader = Loader(cfg, ds, global_batch=2, is_train=False, num_workers=1)
        model = STCATNet(cfg)
        batch, _, _ = next(iter(loader))
        variables = init_variables(cfg, model, jax.random.PRNGKey(0), batch)
        params, constants = variables["params"], variables.get("constants", {})
        evaluator = build_evaluator(cfg, None, "test")
        fwd = make_eval_forward(cfg, model, mesh)
        results[split_on] = do_eval(
            cfg, model, params, constants, loader, evaluator, fwd, mesh=mesh
        )

    assert results[False].keys() == results[True].keys()
    for k in results[False]:
        np.testing.assert_allclose(
            results[True][k], results[False][k], rtol=1e-5, atol=1e-7,
            err_msg=k,
        )
