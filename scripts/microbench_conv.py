"""Per-stage backbone conv microbench: XLA vs fused Pallas block kernel.

Measures steady-state ms for each ResNet stage's stride-1 bottleneck chain at
the flagship shape (64 frames @416, bf16, R101) to set the TPU.CONV_IMPL /
TPU.CONV_STAGES routing defaults. Run on the real chip:

    python scripts/microbench_conv.py [stage ...]

Results recorded in docs/STATUS.md roofline table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from stcat_tpu.kernels.conv import BlockWeights, bottleneck_reference, fused_bottleneck

# (stage, n, h, cin, planes, n_stride1_blocks incl. ds-block for layer1)
STAGES = {
    "l1": (64, 104, 64, 64, 3),      # block0 has ds (stride 1)
    "l2": (64, 52, 512, 128, 3),     # blocks 1..3
    "l3": (64, 26, 1024, 256, 22),   # blocks 1..22
    "l4": (64, 13, 2048, 512, 2),    # blocks 1..2
}


def make_weights(rng, cin, p, ds):
    cout = 4 * p
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
    return BlockWeights(
        w1=mk(cin, p), b1=mk(1, 1, p), w2=mk(3, 3, p, p), b2=mk(1, 1, p),
        w3=mk(p, cout), b3=mk(1, 1, cout),
        wd=mk(cin, cout) if ds else None, bd=mk(1, 1, cout) if ds else None,
    )


def chain(fn, weights_list):
    def run(x):
        for bw in weights_list:
            x = fn(x, bw, 1)
        return x
    return run


def measure(fn, x, n_iters=20):
    @jax.jit
    def loop(x):
        def body(x, _):
            y = fn(x)
            chk = jnp.sum(y[..., :1].astype(jnp.float32))
            return x + (1e-12 * chk).astype(x.dtype), chk
        _, chks = jax.lax.scan(body, x, None, length=n_iters)
        return jnp.sum(chks)

    np.asarray(loop(x))  # compile + warmup
    np.asarray(loop(x))  # platform warmup (terminal-side load)
    t0 = time.perf_counter()
    np.asarray(loop(x))
    return (time.perf_counter() - t0) / n_iters * 1e3


def main():
    rng = np.random.RandomState(0)
    which = sys.argv[1:] or list(STAGES)
    for name in which:
        n, h, cin, p, nblocks = STAGES[name]
        ws = []
        ci = cin
        for j in range(nblocks):
            ds = name == "l1" and j == 0
            ws.append(make_weights(rng, ci, p, ds))
            ci = 4 * p
        x = jnp.asarray(rng.randn(n, h, h, cin).astype(np.float32) * 0.5).astype(
            jnp.bfloat16
        )
        t_ref = measure(chain(bottleneck_reference, ws), x)
        t_pal = measure(chain(fused_bottleneck, ws), x)
        print(
            f"{name}: {nblocks} blocks @ [{n},{h},{h},{cin}] p={p}  "
            f"xla {t_ref:7.2f} ms   pallas {t_pal:7.2f} ms   "
            f"speedup {t_ref / t_pal:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
