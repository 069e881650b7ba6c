"""Sequence-parallel frontier probe (verdict r4 task 6).

Measures, on the real chip, the single-chip FLAGSHIP train step (R101 +
RoBERTa-base dims, @448) as the clip length T grows: step wall time and
HBM high-water per (T, remat policy), probing until the allocator refuses.
The point where one chip's HBM forces a smaller T is the frontier where
TPU.SEQUENCE_PARALLEL (shard the frame axis over the mesh, core/mesh.py)
becomes the right tool -- below it, a single chip with remat is faster
than paying SP's gather collectives (ref long-video handling is purely
algorithmic: factorized attention + frame caps, modal_encoder.py:161-195).

Each config runs in a SUBPROCESS so an OOM kills the probe point, not the
sweep. Results append to artifacts/sp_frontier.jsonl; the digested table
lives in docs/STATUS.md.

    python scripts/sp_frontier.py            # sweep
    python scripts/sp_frontier.py --one T REMAT   # internal: one point
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SWEEP_T = [64, 128, 192, 256, 384, 512]
REMATS = {"light": "[1,2]", "full": "[1,2,3,4]"}
OUT = os.path.join(REPO, "artifacts", "sp_frontier.jsonl")


def run_one(t: int, remat: str) -> dict:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO, "artifacts", "xla_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg, _make_batch
    from stcat_tpu.config import merge_from_list
    from stcat_tpu.core.mesh import make_mesh, shard_batch
    from stcat_tpu.models import STCATNet
    from stcat_tpu.train.optimizer import make_optimizer
    from stcat_tpu.train.step import create_train_state, make_train_step
    from bench import _toy_targets

    cfg = merge_from_list(
        _flagship_cfg(tiny=False),
        ["INPUT.RESOLUTION", "448", "INPUT.MAX_VIDEO_LEN", str(max(SWEEP_T)),
         "TPU.REMAT_BACKBONE", "true", "TPU.REMAT_STAGES", REMATS[remat]],
    )
    model = STCATNet(cfg)
    batch = _make_batch(b=1, t=t, h=448, w=448, l=16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    mesh = make_mesh(1)
    tx, _ = make_optimizer(cfg, variables["params"], num_training_steps=1000)
    state = create_train_state(cfg, variables, tx)
    step = make_train_step(cfg, model, tx, mesh)
    batch = shard_batch(batch, mesh)
    targets = shard_batch(_toy_targets(1, t), mesh)
    rng = jax.random.PRNGKey(0)

    for _ in range(2):  # compile + one-time platform load
        state, m = step(state, batch, targets, rng)
        float(m["loss"])
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch, targets, rng)
    float(m["loss"])
    step_ms = (time.perf_counter() - t0) / n * 1e3

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for k in ("peak_bytes_in_use", "bytes_in_use", "bytes_limit"):
            if k in stats:
                mem[k] = int(stats[k])
    except Exception as e:  # noqa: BLE001 -- stats are best-effort
        mem["error"] = repr(e)
    if not mem:
        # axon exposes no runtime memory_stats; fall back to the compiled
        # program's own accounting (persistent cache makes this re-compile
        # a cache hit). temp = activations+workspace, argument = params +
        # opt state + batch -- their sum is the program's HBM demand.
        try:
            jfn = next(iter(getattr(step, "jitted", {}).values()))
            ma = jfn.lower(state, batch, targets, rng).compile().memory_analysis()
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    mem[k] = int(v)
        except Exception as e:  # noqa: BLE001 -- analysis is best-effort
            mem["mem_analysis_error"] = repr(e)
    return {"t": t, "remat": remat, "step_ms": round(step_ms, 2), **mem}


def main():
    if len(sys.argv) >= 4 and sys.argv[1] == "--one":
        rec = run_one(int(sys.argv[2]), sys.argv[3])
        print("RESULT " + json.dumps(rec), flush=True)
        return

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    budget = float(os.environ.get("SP_FRONTIER_BUDGET_S", "5400"))
    t0 = time.monotonic()
    # resume: (t, remat) points already recorded (a prior run's compiles are
    # in the persistent cache anyway, but skipping avoids re-measuring)
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done[(r.get("t"), r.get("remat"))] = r
                except json.JSONDecodeError:
                    pass
    for remat in ("light", "full"):
        oomed = False
        for t in SWEEP_T:
            if oomed:
                break
            prev = done.get((t, remat))
            if prev is not None:
                oomed = bool(prev.get("oom"))
                print(f"resume: have T={t} remat={remat}", flush=True)
                continue
            if time.monotonic() - t0 > budget:
                print(f"budget exhausted before T={t} remat={remat}")
                break
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 str(t), remat],
                capture_output=True, text=True, timeout=2400,
            )
            rec = None
            for line in p.stdout.splitlines():
                if line.startswith("RESULT "):
                    rec = json.loads(line[len("RESULT "):])
            if rec is None:
                # search the FULL output for allocator refusal: the XLA OOM
                # report ends with a buffer table, so the telltale phrases
                # can sit thousands of chars before the tail (the r5 sweep's
                # first light-remat OOM at T=192 was missed exactly so)
                out = p.stdout + p.stderr
                oom = any(s in out for s in (
                    "RESOURCE_EXHAUSTED", "Out of memory", "out of memory",
                    "Allocation type: HLO temp", "exceeds the limit",
                ))
                rec = {"t": t, "remat": remat, "oom": oom, "rc": p.returncode,
                       "tail": out[-400:]}
                oomed = oom  # larger T at the same policy will OOM too
            rec["ts"] = time.time()
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
