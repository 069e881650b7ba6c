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

vs_baseline: the reference publishes NO throughput numbers (SURVEY.md §6),
so the ratio is grounded in a reproducible formula instead of a folklore
constant: the reference evaluates one test clip as TWO serial 64-frame
stream forwards (engine/evaluate.py:97-109) of the SAME architecture, so
its per-clip FLOPs equal the XLA cost analysis of our stacked batch-2
forward (identical math, SURVEY §2c); the reference runs plain fp32 torch
1.10 with no AMP anywhere in the repo (requirements.txt, train_net.py), on
"an 8-GPU node" (README.md:75) -- V100-class for a 2022 NeurIPS paper.
    baseline_clips_per_sec = V100_FP32_PEAK * REF_CONV_UTIL / flops_per_clip
with V100_FP32_PEAK = 15.7 TFLOP/s (published) and REF_CONV_UTIL = 0.45 (a
generous cuDNN utilization assumption for R101-dominated fp32 convs; real
measured torch R101 eval utilization is usually 30-45%). The legacy
estimate (1.4 clips/s, rounds 1-3) is still reported as
vs_baseline_estimate for cross-round continuity.

Driver-budget safety (round-5 verdict task 1): the primary-metric JSON
line is printed (flushed) the moment it exists, and the enriched record is
RE-printed after every completed section -- the driver takes the last JSON
line, so a timeout costs only the unfinished sections. A total wall budget
(env BENCH_BUDGET_S, default 1500 s -- sized under the driver's observed
1800 s kill: r4 died at rc=124, bench_elapsed 1797.8) is checked before
each section using COLD estimates (measured end-to-end section walls on
the tunneled chip, r4/r5) unless a previous bench run completed every
section on this host (a BENCH_WARM marker inside the cache dir), in which
case warm estimates apply. The cache lives under
artifacts/xla_cache_tpu (gitignored -- ~0.5 GB is too large to track; it
persists on the bench host across runs). Sections that do not fit are
skipped with a recorded reason and the script exits rc=0 inside the
budget either way -- the gating is sized so a fully COLD run still emits
the primary metric plus explicit SKIPPED reasons and exits 0.
"""

import dataclasses
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CLIPS_PER_SEC_ESTIMATE = 1.4  # rounds 1-3 constant, kept for continuity
V100_FP32_PEAK = 15.7e12  # published V100 fp32 peak FLOP/s
REF_CONV_UTIL = 0.45      # assumed cuDNN utilization of the fp32 reference
_REPO = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(_REPO, ".cache")
# persistent compile cache (gitignored: ~0.5 GB; persists on the bench host)
XLA_CACHE_DIR = os.path.join(_REPO, "artifacts", "xla_cache_tpu")
BENCH_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
_T0 = time.monotonic()


def _remaining() -> float:
    return BENCH_BUDGET_S - (time.monotonic() - _T0)


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

    # TWO untimed executions, like measure_train_step: the first call after
    # the chipless AOT compile pays a one-time terminal-side load, and with
    # a single warmup that load lands INSIDE the timed window (observed: the
    # DC5 S=801 section recorded 34.7 ms vs a 22.9-23.0 ms steady state that
    # a re-probe with two warmups reproduced across repeats, both impls).
    np.asarray(fwd_loop(variables, batch))  # compile
    np.asarray(fwd_loop(variables, batch))  # absorb the deferred load
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


def _fresh_variables(variables):
    """Donation-safe per-section copy: the master tree lives on DEVICE once
    (main ships it over the link a single time); jnp.copy forks fresh device
    buffers so a donated train state never invalidates the master (verdict
    r3 weak #8: re-shipping ~0.7 GB of params per section through a
    ~35 MB/s tunnel cost tens of seconds each)."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, variables)


def measure_train_step(cfg, model, variables, batch, n_iters=30):
    """Steady-state full train step (grad+clip+AdamW 4 groups+EMA), ms/step."""
    import jax
    import jax.numpy as jnp

    from stcat_tpu.core.mesh import make_mesh, shard_batch
    from stcat_tpu.train.optimizer import make_optimizer
    from stcat_tpu.train.step import create_train_state, make_train_step

    variables = _fresh_variables(variables)
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


def measure_e2e_train(variables, n_iters=24, ingest="rgb"):
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

    variables = _fresh_variables(variables)
    model = STCATNet(cfg)
    mesh = make_mesh(1)
    tx, _ = make_optimizer(cfg, variables["params"], num_training_steps=1000)
    state = create_train_state(cfg, variables, tx)
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


def measure_e2e_eval(variables, ingest="rgb", device_split=False):
    """REAL eval chain: JPEG decode -> raw loader -> 2-stream stack ->
    device preprocess -> jitted forward -> postprocess -> evaluator.
    The full do_eval pass (eval/engine.py), timed on its second run
    (first pass pays the compiles). Returns ms per test clip.

    ingest="yuv420" ships 4:2:0 planes (half the host->device wire bytes;
    JPEG stores 4:2:0 natively) -- on the tunneled chip the transfer is the
    eval bottleneck, so this is the production layout (verdict r3 task 3).

    device_split=True ships the clip ONCE and does the even/odd split +
    stream stacking inside the jitted forward (TPU.EVAL_DEVICE_SPLIT,
    core/batch.device_split_streams): wire bytes are identical (the streams
    partition the clip) but the host-side pixel copies disappear (verdict
    r4 task 7 measurement)."""
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
        ["DATA_DIR", data_dir, "DATALOADER.NUM_WORKERS", "2",
         "TPU.INGEST_LAYOUT", ingest,
         "TPU.EVAL_DEVICE_SPLIT", str(bool(device_split)).lower()],
    )
    ds = VidSTGDataset(cfg, "test")
    model = STCATNet(cfg)
    mesh = make_mesh(1)
    params = variables["params"]  # device-resident master, eval never donates
    constants = variables.get("constants", {})
    fwd = make_eval_forward(cfg, model, mesh)

    def one_pass():
        loader = Loader(cfg, ds, global_batch=1, is_train=False, num_workers=2)
        evaluator = build_evaluator(cfg, None, "test")
        t0 = time.perf_counter()
        do_eval(cfg, model, params, constants, loader, evaluator, fwd,
                mesh=mesh)
        return (time.perf_counter() - t0) / len(ds) * 1e3

    one_pass()  # compile + warmup
    ms_per_clip = one_pass()

    # isolate the wire cost: ship ONE representative stacked eval batch
    # (the 2-stream raw batch do_eval builds) and time the device_put alone
    # -- on the tunneled chip this bounds how much of ms_per_clip is pure
    # link latency rather than pipeline inefficiency (verdict r3 task 3).
    # Own try: a flaky probe must not zero out the ms_per_clip that already
    # cost two full do_eval passes.
    transfer_ms = None
    try:
        import jax.numpy as jnp
        import numpy as np

        from stcat_tpu.core.batch import stack_streams
        from stcat_tpu.core.mesh import shard_batch
        from stcat_tpu.eval.engine import subsample_batch

        loader = Loader(cfg, ds, global_batch=1, is_train=False, num_workers=2)
        batch, _, meta = next(iter(loader))
        b1, m1 = subsample_batch(batch, meta, 0)
        b2, _ = subsample_batch(batch, meta, 1)
        stacked = stack_streams(b1, b2)

        @jax.jit
        def _fence(tree):
            # a scalar fetch is the only reliable completion barrier on this
            # platform (block_until_ready does not synchronize; see
            # measure_eval). Sum EVERY leaf so the pixel planes -- the last
            # dataclass fields under yuv420 ingest -- are actually awaited.
            return sum(
                jnp.sum(jnp.asarray(leaf, jnp.float32))
                for leaf in jax.tree_util.tree_leaves(tree)
            )

        np.asarray(_fence(shard_batch(stacked, mesh)))  # warm layout + compile
        t0 = time.perf_counter()
        np.asarray(_fence(shard_batch(stacked, mesh)))
        transfer_ms = (time.perf_counter() - t0) * 1e3
    except Exception as e:  # noqa: BLE001 -- keep the section's main result
        print(f"[bench] e2e_eval transfer probe failed: {e!r}",
              file=sys.stderr, flush=True)
    return ms_per_clip, transfer_ms


def main():
    import jax

    # persistent compile cache: the tunnel platform pays minutes per
    # compile; the dir persists on the bench host across runs (gitignored)
    jax.config.update("jax_compilation_cache_dir", XLA_CACHE_DIR)
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
    # ONE device-resident master variables tree shared by every section
    # (donating sections fork it with _fresh_variables; a host snapshot
    # would cost a ~45 s D2H pull through the tunnel before the primary
    # metric could even print)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), _make_batch(1, t, res, res))

    # The primary metric below is mandatory and is EMITTED IMMEDIATELY;
    # every secondary section is best-effort + budget-gated, and the record
    # is re-emitted after each one, so neither a flaky sub-measurement nor a
    # driver timeout can zero out the round's bench record (r3 lesson:
    # rc=124 with parsed=null because everything printed at the very end).
    errors = []
    skipped = []
    record = {}

    def _emit():
        record["bench_elapsed_s"] = round(time.monotonic() - _T0, 1)
        if errors:
            record["bench_errors"] = errors
        if skipped:
            record["bench_skipped"] = skipped
        sys.stderr.flush()
        print(json.dumps(record), flush=True)

    # cold vs warm estimates: the dominant cost of a cold section is the
    # remote AOT compile, which the persistent cache eliminates on repeat
    # runs. "Warm" means THIS script's sections are cached, which only a
    # previous bench run that reached every section can guarantee -- other
    # tools (sp_frontier, precompile) share the cache dir, so a bare
    # file-count check would misclassify their entries as bench warmth and
    # the under-estimated sections would overrun the driver kill window.
    # A fully-unskipped run drops a marker inside the cache dir (gitignored
    # with it); its presence is the warm signal.
    warm_marker = os.path.join(XLA_CACHE_DIR, "BENCH_WARM")
    warm_cache = os.path.exists(warm_marker)
    print(f"[bench] compile cache {'WARM' if warm_cache else 'COLD'} "
          f"({XLA_CACHE_DIR})", file=sys.stderr, flush=True)

    def _try(name, fn, est_s, update):
        """Run one budget-gated section; fold its result into the record and
        re-emit. est_s is (cold_s, warm_s) worst-case wall estimates -- if
        the remaining budget cannot cover the applicable one, skip (a
        skipped section is a one-line reason in the record; a timed-out
        section is a LOST record)."""
        if isinstance(est_s, tuple):
            est_s = est_s[1] if warm_cache else est_s[0]
        if _remaining() < est_s:
            skipped.append(f"{name}: budget ({_remaining():.0f}s left < {est_s}s est)")
            print(f"[bench] {name}: SKIPPED reason=budget", file=sys.stderr,
                  flush=True)
            _emit()
            return
        t0 = time.perf_counter()
        try:
            out = fn()
            print(f"[bench] {name}: ok ({time.perf_counter() - t0:.1f}s)",
                  file=sys.stderr, flush=True)
            if out is not None:
                update(out)
        except Exception as e:  # noqa: BLE001 -- keep the record alive
            errors.append(f"{name}: {type(e).__name__}: {e}")
            print(f"[bench] {name} FAILED: {e}", file=sys.stderr, flush=True)
        _emit()

    eval_ms = measure_eval(model, variables, batch2)
    clips_per_sec = 2.0 / (eval_ms / 1e3)  # 2 stream-forwards per iteration
    record.update({
        "metric": "eval_clips_per_sec_per_chip_r101_416_64f",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s/chip",
        # grounded ratio lands with the flops section below; until then the
        # legacy estimate keeps the field non-null
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC_ESTIMATE, 3),
        "vs_baseline_estimate": round(
            clips_per_sec / BASELINE_CLIPS_PER_SEC_ESTIMATE, 3),
        "eval_stacked2_ms": round(eval_ms, 2),
    })
    _emit()  # the primary metric survives from this line on

    # grounded baseline (verdict r3 task 4): XLA-counted FLOPs of the
    # stacked batch-2 forward == the reference's per-clip eval FLOPs (two
    # serial 64f stream forwards of the same architecture); divide an fp32
    # V100 peak x documented utilization assumption by it. Cheap and it
    # grounds vs_baseline, so it runs first among the secondaries.
    def _upd_flops(flops):
        record["eval_fwd_tflops_per_sec"] = round(flops / (eval_ms / 1e3) / 1e12, 2)
        baseline = V100_FP32_PEAK * REF_CONV_UTIL / flops
        record["baseline_clips_per_sec_grounded"] = round(baseline, 4)
        record["baseline_formula"] = (
            f"V100_fp32_peak {V100_FP32_PEAK:.3g} * util {REF_CONV_UTIL} "
            f"/ per_clip_flops {flops:.4g}"
        )
        record["vs_baseline"] = round(clips_per_sec / baseline, 3)

    _try("flops", lambda: forward_flops(model, variables, batch2), (90, 30), _upd_flops)

    def _train():
        train_cfg = merge_from_list(
            _flagship_cfg(tiny=False), ["TPU.REMAT_BACKBONE", "true"])
        train_model = STCATNet(train_cfg)
        return measure_train_step(
            train_cfg, train_model, variables,
            _make_batch(b=1, t=t, h=res, w=res, l=16),
        )

    _try("train_step", _train, (420, 100),
         lambda ms: record.update(train_step_ms_r101_416_64f=round(ms, 2)))

    # 4:2:0 ingest first: the production layout for bandwidth-limited links
    # and the round-3 headline the driver record lost
    def _upd_e2e_yuv(e2e):
        e2e_ms, compute_ms, wait_ms = e2e
        record.update({
            "e2e_yuv420_step_ms": round(e2e_ms, 2),
            "e2e_yuv420_clips_per_sec": round(1e3 / e2e_ms, 3),
            "e2e_yuv420_data_wait_frac": round(wait_ms / e2e_ms, 4),
            # own key: e2e_compute_step_ms belongs to the rgb section, and a
            # budget-skipped rgb run must not silently re-scope it
            "e2e_yuv420_compute_step_ms": round(compute_ms, 2),
        })

    _try("e2e_train_yuv420",
         lambda: measure_e2e_train(variables, ingest="yuv420"),
         (520, 140), _upd_e2e_yuv)

    def _upd_eval_yuv(out):
        record.update(
            e2e_eval_ms_per_clip=round(out[0], 2),
            e2e_eval_clips_per_sec=round(1e3 / out[0], 3))
        if out[1] is not None:
            record["e2e_eval_transfer_ms"] = round(out[1], 2)

    _try("e2e_eval_yuv420",
         lambda: measure_e2e_eval(variables, ingest="yuv420"), (460, 170),
         _upd_eval_yuv)

    # verdict r4 task 7: same chain with the two-stream split ON DEVICE
    # (TPU.EVAL_DEVICE_SPLIT); the delta vs e2e_eval_ms_per_clip is the
    # measured cost of the host-side subsample/stack pixel copies (wire
    # bytes are identical -- the streams partition the clip)
    def _upd_eval_devsplit(out):
        record["e2e_eval_devsplit_ms_per_clip"] = round(out[0], 2)
        if record.get("e2e_eval_ms_per_clip"):
            record["e2e_eval_devsplit_delta_ms"] = round(
                record["e2e_eval_ms_per_clip"] - out[0], 2)

    _try("e2e_eval_devsplit",
         lambda: measure_e2e_eval(variables, ingest="yuv420",
                                  device_split=True),
         (460, 170), _upd_eval_devsplit)

    def _upd_e2e_rgb(e2e):
        e2e_ms, compute_ms, wait_ms = e2e
        record.update({
            "e2e_train_clips_per_sec": round(1e3 / e2e_ms, 3),
            "e2e_train_step_ms": round(e2e_ms, 2),
            "e2e_compute_step_ms": round(compute_ms, 2),
            "e2e_data_wait_frac": round(wait_ms / e2e_ms, 4),
        })

    _try("e2e_train_rgb", lambda: measure_e2e_train(variables), (520, 140),
         _upd_e2e_rgb)

    def _upd_eval_rgb(out):
        record.update(
            e2e_eval_rgb_ms_per_clip=round(out[0], 2),
            e2e_eval_rgb_clips_per_sec=round(1e3 / out[0], 3))
        if out[1] is not None:
            record["e2e_eval_rgb_transfer_ms"] = round(out[1], 2)

    _try("e2e_eval_rgb", lambda: measure_e2e_eval(variables), (460, 170),
         _upd_eval_rgb)

    # p50 per-clip latency (BASELINE.md metric #3): one stacked batch-2
    # forward IS one test clip; individual dispatches, median
    _try("p50", lambda: measure_p50_latency(model, variables, batch2), (60, 30),
         lambda ms: record.update(p50_clip_latency_ms=round(ms, 2)))

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
            stress_model, variables,
            _make_batch(b=1, t=128, h=448, w=448, l=16),
            n_iters=6,
        )

    _try("stress_128f_448", _stress, (280, 100),
         lambda ms: record.update(
             eval_128f_448_ms=round(ms, 2),
             eval_128f_448_clips_per_sec=round(1e3 / ms, 3)))

    # fused-attention routing proof (verdict r3 task 8): at every published
    # recipe shape the encoder's spatial sequence is S = 1+HW+L <= ~215 and
    # the kernel routes OFF by measurement (kernels/attention.py
    # MIN_FUSED_SEQ; STATUS.md routing table). The cheapest REAL config where
    # routing ENGAGES is the DC5 variant at 448 (layer4 dilation, ref
    # VISION_BACKBONE.DILATION: 28x28 map -> S = 1+784+16 = 801): measure the
    # FULL eval forward there under both impls to show the end-to-end win is
    # real where the router says it is. (The r4 "remote compile helper HTTP
    # 500" at these shapes was the kernel's own scoped-vmem OOM, fixed by
    # the padded-byte group bound in kernels/attention.py _pick_group.)
    def _pallas_long():
        out = {}
        dev_vars = variables
        for impl in ("xla", "pallas"):
            c = merge_from_list(
                _flagship_cfg(tiny=False),
                ["INPUT.RESOLUTION", "448", "TPU.ATTENTION_IMPL", impl,
                 "MODEL.VISION_BACKBONE.DILATION", "true"],
            )
            out[impl] = measure_eval(
                STCATNet(c), dev_vars,
                _make_batch(b=1, t=16, h=448, w=448, l=16), n_iters=6,
            )
        return out

    def _upd_pallas(out):
        record.update({
            "eval_16f_448dc5_xla_ms": round(out["xla"], 2),
            "eval_16f_448dc5_pallas_ms": round(out["pallas"], 2),
            "pallas_attn_speedup_s801": round(out["xla"] / out["pallas"], 3),
            "pallas_routing_note": (
                "recipe shapes (S<=215) route to XLA by measurement; fused "
                "kernel engages at S>=768 (here S=801 via the DC5 28x28 "
                "map), where the full forward measures parity-to-small-win "
                "(attention is a thin slice of the DC5 backbone-dominated "
                "step); kernel-level wins start at S>=1024 (STATUS.md table)"
            ),
        })

    _try("pallas_long_seq", _pallas_long, (340, 130), _upd_pallas)
    if not skipped and not errors:
        # every section ran to completion -> the cache now covers all of
        # bench's programs; future runs may budget with warm estimates
        try:
            os.makedirs(XLA_CACHE_DIR, exist_ok=True)
            with open(warm_marker, "w") as f:
                f.write(json.dumps({"elapsed_s": round(time.monotonic() - _T0, 1)}))
        except OSError as e:
            print(f"[bench] warm marker not written: {e}", file=sys.stderr)
    _emit()


if __name__ == "__main__":
    main()
