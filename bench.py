"""End-to-end per-chip throughput benchmark (driver-run, one JSON line).

Config: BASELINE.json tracked config #2-style -- STCAT R101 + RoBERTa-base,
res 416, 64-frame clips, bf16. Metrics in the JSON line:

  value (primary)              eval stream forwards/s/chip, both temporal
                               streams of a test clip stacked into one
                               batch-2 forward (the reference runs them
                               serially, engine/evaluate.py:106)
  train_step_ms_r101_416_64f   full train step (grad + AdamW 4 LR groups +
                               EMA + per-block remat), synthetic batch
  e2e_train_clips_per_sec      REAL input chain: JPEG corpus (320x240, the
                               reference's load_video=False frame-dir path,
                               vidstg.py:143-150) -> native libjpeg-turbo
                               decode -> uint8 RawVideoBatch -> on-device
                               resample/normalize -> jitted train step
  e2e_compute_step_ms          same compiled step, same batch replayed (the
                               compute-bound rate the e2e chain must track)
  e2e_data_wait_frac           fraction of e2e wall spent blocked on data
                               (decode+assembly not hidden under the step;
                               the tunnel's non-overlapping host->device DMA
                               shows up as e2e_step_ms > compute instead --
                               docs/STATUS.md "Input-feed ceiling")
  e2e_yuv420_*                 same chain shipping the codec's native 4:2:0
                               planes (TPU.INGEST_LAYOUT yuv420, half the
                               wire bytes of RGB)
  e2e_eval_ms_per_clip         full do_eval pass: decode -> 2-stream stack ->
                               device preprocess -> forward -> postprocess ->
                               evaluator, wall per test clip
  eval_128f_448_ms             long-clip stress line (BASELINE.md config #5):
                               128-frame window @448, REMAT_STAGES (1,2,3,4)

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
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")


def measure_eval(model, variables, batch, n_iters=10):
    """Steady-state eval forward, ms/iter."""
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


def forward_flops(model, variables, batch):
    """XLA-reported FLOPs of ONE eval forward (not an estimate: straight
    from the compiled executable's cost analysis). None if the backend
    does not expose it."""
    import jax

    try:
        def fwd(variables, batch):
            out = model.apply(variables, batch, deterministic=True)
            return out["pred_boxes"], out["pred_sted"]

        compiled = jax.jit(fwd).lower(variables, batch).compile()
        costs = compiled.cost_analysis()
        if isinstance(costs, (list, tuple)):
            costs = costs[0]
        f = float(costs.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def measure_p50_latency(model, variables, batch, n_iters=15):
    """Per-clip eval latency: median of INDIVIDUAL dispatched forwards
    (includes dispatch + output fetch -- what a serving caller observes),
    unlike measure_eval's scan-chained steady-state throughput form."""
    import jax
    import numpy as np

    @jax.jit
    def fwd(variables, batch):
        out = model.apply(variables, batch, deterministic=True)
        return out["pred_boxes"].sum() + out["pred_sted"].sum()

    for _ in range(2):  # compile + platform warmup
        float(fwd(variables, batch))
    lat = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        float(fwd(variables, batch))  # scalar fetch forces completion
        lat.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(lat))


def _toy_targets(b, t):
    import numpy as np

    from stcat_tpu.core.batch import VideoTargets

    actioness = np.zeros((b, t), np.float32)
    actioness[:, t // 4: t // 2] = 1.0
    boxes = np.zeros((b, t, 4), np.float32)
    boxes[:, t // 4: t // 2] = np.asarray([0.5, 0.5, 0.2, 0.2], np.float32)
    return VideoTargets(
        boxes=boxes,
        box_valid=actioness.astype(bool),
        actioness=actioness,
        temp_bound=np.tile(np.asarray([t // 4, t // 2 - 1], np.int32), (b, 1)),
    )


def measure_train_step(cfg, model, variables, batch, n_iters=30):
    """Steady-state full train step (grad+clip+AdamW 4 groups+EMA), ms/step."""
    import jax
    import jax.numpy as jnp

    from stcat_tpu.core.mesh import make_mesh, shard_batch
    from stcat_tpu.train.optimizer import make_optimizer
    from stcat_tpu.train.step import create_train_state, make_train_step

    b, t = batch.frames.shape[:2]
    targets = _toy_targets(b, t)
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


def measure_e2e_train(variables_np, n_iters=24, ingest="rgb"):
    """REAL chain: JPEG decode -> raw loader -> device preprocess -> step.

    Corpus: synthetic VidSTG-format cache + 320x240 JPEG frame dirs (no
    ffmpeg binary exists in this image; JPEG via the frame-dir branch is the
    real codec available, and matches the reference's load_video=False path).
    Augmentation: flip on, single-scale (AUG_CROP/AUG_SCALE off) so the run
    stays in ONE compiled canvas -- the multi-canvas cost is a compile-count
    question, not a steady-state-throughput one.

    ingest="yuv420" ships 4:2:0 planes (half the host->device bytes of RGB;
    JPEG stores 4:2:0 natively): on a bandwidth-limited link (this tunnel
    moves ~35 MB/s) the transfer is the e2e bottleneck and the layout is
    the difference between transfer-bound and compute-bound.
    """
    import jax
    import numpy as np

    from stcat_tpu.core.mesh import make_mesh, shard_batch
    from stcat_tpu.data.datasets import VidSTGDataset
    from stcat_tpu.data.loader import Loader
    from stcat_tpu.data.synthetic import (
        materialize_frame_corpus, write_synthetic_cache,
    )
    from stcat_tpu.models import STCATNet
    from stcat_tpu.train.optimizer import make_optimizer
    from stcat_tpu.train.step import create_train_state, make_train_step
    from __graft_entry__ import _flagship_cfg
    from stcat_tpu.config import merge_from_list

    data_dir = os.path.join(CACHE_DIR, "bench_corpus")
    write_synthetic_cache(
        data_dir, "VidSTG", "train", n_items=8, n_frames=96,
        width=320, height=240,
    )
    materialize_frame_corpus(data_dir, "VidSTG", "train")

    cfg = merge_from_list(
        _flagship_cfg(tiny=False),
        [
            "DATA_DIR", data_dir, "INPUT.AUG_SCALE", "false",
            "INPUT.AUG_CROP", "false", "TPU.REMAT_BACKBONE", "true",
            "DATALOADER.NUM_WORKERS", "2", "SOLVER.MAX_EPOCH", "100",
            "TPU.INGEST_LAYOUT", ingest,
        ],
    )
    ds = VidSTGDataset(cfg, "train")
    loader = Loader(cfg, ds, global_batch=1, is_train=True, num_workers=2)
    assert loader.raw, "device-preprocess mode must engage for the e2e bench"

    model = STCATNet(cfg)
    mesh = make_mesh(1)
    tx, _ = make_optimizer(cfg, variables_np["params"], num_training_steps=1000)
    state = create_train_state(cfg, variables_np, tx)
    step = make_train_step(cfg, model, tx, mesh)
    rng = jax.random.PRNGKey(0)

    it = iter(loader)
    b0, t0_, _ = next(it)
    b0s, t0s = shard_batch(b0, mesh), shard_batch(t0_, mesh)
    for _ in range(2):  # compile + platform warmup
        state, m = step(state, b0s, t0s, rng)
        float(m["loss"])

    # compute-bound rate: same compiled program, same device batch replayed
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, b0s, t0s, rng)
    float(m["loss"])
    compute_ms = (time.perf_counter() - t0) / n_iters * 1e3

    # end-to-end: decode->transform-plan->batch->TRANSFER->step, with both
    # batch assembly (loader pool) and the host->device put (device_prefetch
    # thread) overlapping device execution -- on a remotely-attached chip the
    # put alone costs ~0.4 s/batch (measured ~35 MB/s tunnel), so without the
    # transfer pipeline the loop is transfer-bound, not compute-bound.
    # data_wait below therefore counts decode+assembly+transfer not hidden
    # under the step.
    from stcat_tpu.core.prefetch import device_prefetch

    stream = device_prefetch(
        it, lambda x: (shard_batch(x[0], mesh), shard_batch(x[1], mesh)), depth=3
    )
    data_wait = 0.0
    t0 = time.perf_counter()
    for i in range(n_iters):
        tw = time.perf_counter()
        batch, targets = next(stream)
        data_wait += time.perf_counter() - tw
        state, m = step(state, batch, targets, rng)
    float(m["loss"])
    e2e_ms = (time.perf_counter() - t0) / n_iters * 1e3
    return e2e_ms, compute_ms, data_wait / n_iters * 1e3


def measure_e2e_eval(variables_np):
    """REAL eval chain: JPEG decode -> raw loader -> 2-stream stack ->
    device preprocess -> jitted forward -> postprocess -> evaluator.
    The full do_eval pass (eval/engine.py), timed on its second run
    (first pass pays the compiles). Returns ms per test clip."""
    import jax

    from stcat_tpu.config import merge_from_list
    from stcat_tpu.core.mesh import make_mesh
    from stcat_tpu.data.datasets import VidSTGDataset
    from stcat_tpu.data.loader import Loader
    from stcat_tpu.data.synthetic import (
        materialize_frame_corpus, write_synthetic_cache,
    )
    from stcat_tpu.eval import build_evaluator, do_eval
    from stcat_tpu.models import STCATNet
    from stcat_tpu.train.step import make_eval_forward
    from __graft_entry__ import _flagship_cfg

    data_dir = os.path.join(CACHE_DIR, "bench_corpus")
    write_synthetic_cache(
        data_dir, "VidSTG", "test", n_items=8, n_frames=96,
        width=320, height=240,
    )
    materialize_frame_corpus(data_dir, "VidSTG", "test")

    cfg = merge_from_list(
        _flagship_cfg(tiny=False),
        ["DATA_DIR", data_dir, "DATALOADER.NUM_WORKERS", "2"],
    )
    ds = VidSTGDataset(cfg, "test")
    model = STCATNet(cfg)
    mesh = make_mesh(1)
    params = jax.device_put(variables_np["params"])
    constants = jax.device_put(variables_np.get("constants", {}))
    fwd = make_eval_forward(cfg, model, mesh)

    def one_pass():
        loader = Loader(cfg, ds, global_batch=1, is_train=False, num_workers=2)
        evaluator = build_evaluator(cfg, None, "test")
        t0 = time.perf_counter()
        do_eval(cfg, model, params, constants, loader, evaluator, fwd,
                mesh=mesh)
        return (time.perf_counter() - t0) / len(ds) * 1e3

    one_pass()  # compile + warmup
    return one_pass()


def main():
    import jax

    # persistent compile cache: the tunnel platform pays minutes per
    # compile; cache under the repo so later driver runs skip them
    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE_DIR, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from __graft_entry__ import _flagship_cfg, _make_batch
    from stcat_tpu.config import merge_from_list
    from stcat_tpu.models import STCATNet

    cfg = _flagship_cfg(tiny=False)
    model = STCATNet(cfg)

    t, res = 64, cfg.INPUT.RESOLUTION
    # batch 2 = the stacked even/odd streams of one 128-frame test clip
    batch2 = _make_batch(b=2, t=t, h=res, w=res, l=16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), _make_batch(1, t, res, res))
    # host snapshot BEFORE any donated train step can alias these buffers
    # (memory: donation aliasing hazard)
    variables_np = jax.tree_util.tree_map(np.asarray, variables)

    # The primary metric below is mandatory; every secondary section is
    # best-effort so one flaky sub-measurement (tunnel hiccup, OOM at a
    # stress shape) cannot zero out the round's whole bench record.
    errors = []

    def _try(name, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            print(f"[bench] {name}: ok ({time.perf_counter() - t0:.1f}s)",
                  file=sys.stderr, flush=True)
            return out
        except Exception as e:  # noqa: BLE001 -- keep the record alive
            errors.append(f"{name}: {type(e).__name__}: {e}")
            print(f"[bench] {name} FAILED: {e}", file=sys.stderr, flush=True)
            return None

    eval_ms = measure_eval(model, variables, batch2)
    clips_per_sec = 2.0 / (eval_ms / 1e3)  # 2 stream-forwards per iteration

    # measured MXU utilization: XLA's own FLOP count for the compiled
    # forward over the measured wall time (weak-item fix: the throughput
    # ratio rests on an estimated torch rate, this number does not)
    flops = _try("flops", lambda: forward_flops(model, variables, batch2))
    tflops_per_sec = (flops / (eval_ms / 1e3) / 1e12) if flops else None

    # p50 per-clip latency (BASELINE.md metric #3): one stacked batch-2
    # forward IS one test clip; individual dispatches, median
    p50_ms = _try("p50", lambda: measure_p50_latency(model, variables, batch2))

    # long-clip stress (BASELINE.md tracked config #5): 128f @448, full-remat
    # fallback policy for the bigger activation footprint
    def _stress():
        stress_cfg = merge_from_list(
            _flagship_cfg(tiny=False),
            ["INPUT.RESOLUTION", "448", "TPU.REMAT_STAGES", "[1,2,3,4]"],
        )
        stress_model = STCATNet(stress_cfg)
        # device_put ONCE: passing the host tree would re-ship ~0.2 GB of
        # params per timed call through the device link and swamp the
        # measurement
        return measure_eval(
            stress_model, jax.device_put(variables_np),
            _make_batch(b=1, t=128, h=448, w=448, l=16),
            n_iters=6,
        )

    stress_ms = _try("stress_128f_448", _stress)

    def _train():
        train_cfg = merge_from_list(
            _flagship_cfg(tiny=False), ["TPU.REMAT_BACKBONE", "true"])
        train_model = STCATNet(train_cfg)
        return measure_train_step(
            train_cfg, train_model, variables_np,
            _make_batch(b=1, t=t, h=res, w=res, l=16),
        )

    train_ms = _try("train_step", _train)

    e2e = _try("e2e_train_rgb", lambda: measure_e2e_train(variables_np))
    # 4:2:0 ingest: same chain, half the wire bytes (production layout for
    # bandwidth-limited ingest; JPEG/H.264 sources are natively 4:2:0)
    e2e_yuv = _try("e2e_train_yuv420",
                   lambda: measure_e2e_train(variables_np, ingest="yuv420"))
    e2e_eval_ms = _try("e2e_eval", lambda: measure_e2e_eval(variables_np))

    record = {
        "metric": "eval_clips_per_sec_per_chip_r101_416_64f",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
        "eval_stacked2_ms": round(eval_ms, 2),
    }
    if train_ms is not None:
        record["train_step_ms_r101_416_64f"] = round(train_ms, 2)
    if e2e is not None:
        e2e_ms, e2e_compute_ms, data_wait_ms = e2e
        record.update({
            "e2e_train_clips_per_sec": round(1e3 / e2e_ms, 3),
            "e2e_train_step_ms": round(e2e_ms, 2),
            "e2e_compute_step_ms": round(e2e_compute_ms, 2),
            "e2e_data_wait_frac": round(data_wait_ms / e2e_ms, 4),
        })
    if e2e_yuv is not None:
        e2e_yuv_ms, _, yuv_wait_ms = e2e_yuv
        record.update({
            "e2e_yuv420_step_ms": round(e2e_yuv_ms, 2),
            "e2e_yuv420_clips_per_sec": round(1e3 / e2e_yuv_ms, 3),
            "e2e_yuv420_data_wait_frac": round(yuv_wait_ms / e2e_yuv_ms, 4),
        })
    if e2e_eval_ms is not None:
        record.update({
            "e2e_eval_ms_per_clip": round(e2e_eval_ms, 2),
            "e2e_eval_clips_per_sec": round(1e3 / e2e_eval_ms, 3),
        })
    if stress_ms is not None:
        record.update({
            "eval_128f_448_ms": round(stress_ms, 2),
            "eval_128f_448_clips_per_sec": round(1e3 / stress_ms, 3),
        })
    if p50_ms is not None:
        record["p50_clip_latency_ms"] = round(p50_ms, 2)
    if tflops_per_sec:
        record["eval_fwd_tflops_per_sec"] = round(tflops_per_sec, 2)
    if errors:
        record["bench_errors"] = errors
    print(json.dumps(record))


if __name__ == "__main__":
    main()
