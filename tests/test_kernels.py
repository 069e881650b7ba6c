"""Pallas flash-attention kernel vs unfused reference (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stcat_tpu.kernels.attention as ka


@pytest.fixture(autouse=True)
def interpret_mode():
    ka._INTERPRET = True
    yield
    ka._INTERPRET = False


def make_inputs(bh=4, sq=37, sk=53, d=32, seed=0, masked=True):
    rng = np.random.RandomState(seed)
    q = rng.randn(bh, sq, d).astype(np.float32)
    k = rng.randn(bh, sk, d).astype(np.float32)
    v = rng.randn(bh, sk, d).astype(np.float32)
    bias = np.zeros((bh, sk), np.float32)
    if masked:
        bias[:, sk - 9:] = -1e30  # padded tail keys
        bias[0, 3] = -1e30
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias)


def test_flash_matches_unfused():
    q, k, v, bias = make_inputs()
    out = ka._flash_fwd(q, k, v, bias)
    ref = ka._xla_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_query_len_one():
    # decoder cross-attention shape: single query per frame
    q, k, v, bias = make_inputs(bh=8, sq=1, sk=223)
    out = ka._flash_fwd(q, k, v, bias)
    ref = ka._xla_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_multi_k_blocks():
    q, k, v, bias = make_inputs(bh=2, sq=130, sk=300)
    out = ka._flash_fwd(q, k, v, bias)
    ref = ka._xla_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_gradients_match():
    q, k, v, bias = make_inputs(bh=2, sq=16, sk=24)

    def loss_fused(q, k, v):
        return jnp.sum(ka.flash_attention(q, k, v, bias) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ka._xla_attention(q, k, v, bias) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def make_split_inputs(bh=8, sq=1, sk=53, dk=64, dv=32, seed=1, masked=True):
    rng = np.random.RandomState(seed)
    q = rng.randn(bh, sq, dk).astype(np.float32)
    k = rng.randn(bh, sk, dk).astype(np.float32)
    v = rng.randn(bh, sk, dv).astype(np.float32)
    bias = np.zeros((bh, sk), np.float32)
    if masked:
        bias[:, sk - 7:] = -1e30
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias)


def test_flash_split_qk_v_widths():
    """The DAB concat cross-attention shape: Dk = 2*Dv, query length 1."""
    q, k, v, bias = make_split_inputs()
    out = ka._flash_fwd(q, k, v, bias)
    ref = ka._xla_attention(q, k, v, bias)
    assert out.shape == (8, 1, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_fused_backward_matches():
    """The fused Pallas backward (recompute-in-VMEM) vs XLA autodiff,
    including the split-width case and the bias gradient."""
    for make in (make_inputs, make_split_inputs):
        q, k, v, bias = make(bh=2, sq=16, sk=24)

        def loss_fused(q, k, v, bias):
            return jnp.sum(ka.flash_attention(q, k, v, bias) ** 2)

        def loss_ref(q, k, v, bias):
            return jnp.sum(ka._xla_attention(q, k, v, bias) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_flash_backward_long_seq_falls_back():
    """Past the VMEM tile budget the bwd must route to the XLA recompute."""
    q, k, v, bias = make_inputs(bh=1, sq=1100, sk=1100, d=8)

    def loss(q):
        return jnp.sum(ka.flash_attention(q, k, v, bias))

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()


# --------------------------------------------------------------------------
# fused bottleneck conv kernel (kernels/conv.py)
# --------------------------------------------------------------------------

import stcat_tpu.kernels.conv as kconv


@pytest.fixture(autouse=True)
def conv_interpret_mode():
    kconv._INTERPRET = True
    yield
    kconv._INTERPRET = False


def make_block(rng, cin, p, ds, scale=0.1):
    cout = 4 * p
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * scale)
    return kconv.BlockWeights(
        w1=mk(cin, p), b1=mk(1, 1, p), w2=mk(3, 3, p, p), b2=mk(1, 1, p),
        w3=mk(p, cout), b3=mk(1, 1, cout),
        wd=mk(cin, cout) if ds else None, bd=mk(1, 1, cout) if ds else None,
    )


@pytest.mark.parametrize(
    "n,h,w,cin,p,ds,dil",
    [
        (2, 8, 8, 16, 8, True, 1),   # layer1 block0 shape class (ds, s1)
        (1, 8, 6, 32, 8, False, 1),  # identity-skip block, non-square
        (1, 10, 10, 32, 8, False, 2),  # dc5-style dilated block
    ],
)
def test_fused_bottleneck_matches_reference(n, h, w, cin, p, ds, dil):
    rng = np.random.RandomState(0)
    bw = make_block(rng, cin, p, ds)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32) * 0.5)
    out = kconv.fused_bottleneck(x, bw, dil)
    ref = kconv.bottleneck_reference(x, bw, dil)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_bottleneck_row_chunking_halo():
    """Force multi-chunk execution so the chunk-halo branches are exercised."""
    rng = np.random.RandomState(1)
    bw = make_block(rng, 32, 8, False)
    x = jnp.asarray(rng.randn(1, 12, 8, 32).astype(np.float32))
    old = kconv._TILE_BUDGET
    kconv._TILE_BUDGET = 24 * 1024  # tiny budget -> R > 1
    try:
        assert kconv._pick_chunks(12, 8, 32, 8, 32, 1) > 1
        out = kconv.fused_bottleneck(x, bw, 1)
    finally:
        kconv._TILE_BUDGET = old
    ref = kconv.bottleneck_reference(x, bw, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_bottleneck_backward_matches_reference():
    rng = np.random.RandomState(2)
    bw = make_block(rng, 8, 8, True)
    x = jnp.asarray(rng.randn(1, 6, 6, 8).astype(np.float32))

    def loss_fused(x, bwts):
        return jnp.sum(kconv.fused_bottleneck(x, bwts, 1) ** 2)

    def loss_ref(x, bwts):
        return jnp.sum(kconv.bottleneck_reference(x, bwts, 1) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, bw)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, bw)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-4)
    for a, b in zip(gw_f, gw_r):
        if a is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_resnet_conv_impl_parity():
    """Whole backbone through the fused path == nn.Conv path, same tree."""
    from stcat_tpu.models.resnet import ResNet

    x = jnp.asarray(np.random.RandomState(3).randn(1, 16, 16, 3).astype(np.float32))
    kw = dict(depths=(2, 2), frozen_stages=0)
    ref_model = ResNet(conv_impl="xla", **kw)
    variables = ref_model.init(jax.random.PRNGKey(0), x)
    pal_model = ResNet(conv_impl="pallas", **kw)
    v2 = pal_model.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    ref = ref_model.apply(variables, x)
    out = pal_model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

def test_pick_group_bounds_padded_vmem_footprint():
    """Regression: 128f@448 temporal-decoder cross-attn (q [128,8,33],
    k [128,896,33] bf16) OOMed scoped vmem (28M > 16M) because the group was
    sized on the fp32 weight tile alone, ignoring Mosaic's 128-lane padding
    of the 33/32-deep K/V blocks. The byte bound must hold on PADDED dims."""
    g = ka._pick_group(128, 8, 896, cap=32, dk1=33, dv=32, itemsize=2)
    sub = 16
    depth = 128 + 128  # dk1=33 and dv=32 both pad to 128 lanes
    per_g = (ka._ceil_to(8, sub) + ka._ceil_to(896, sub)) * depth * 2 * 2
    assert g * per_g <= ka._VMEM_BYTES_BUDGET, (g, g * per_g)
    assert 128 % g == 0
    # the BACKWARD at the same shape adds dq/dk/dv output blocks (~a second
    # copy of the input set): its group must budget both sets
    gb = ka._pick_group(128, 8, 896, cap=8, budget=ka._BWD_TILE_BUDGET,
                        dk1=33, dv=32, itemsize=2, block_sets=2)
    assert gb * per_g * 2 <= ka._VMEM_BYTES_BUDGET, (gb, gb * per_g * 2)
    assert 128 % gb == 0
    # short-seq recipe shapes keep a healthy group (kernel efficiency)
    assert ka._pick_group(64, 224, 224, cap=32, dk1=65, dv=64, itemsize=2) >= 8


def test_flash_small_depth_long_kv_matches():
    """Numerics at the exact OOM-shape family (tiny Sq, long Sk, depth 32)."""
    q, k, v, bias = make_inputs(bh=8, sq=8, sk=896, d=32)
    out = ka._flash_fwd(q, k, v, bias)
    ref = ka._xla_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
