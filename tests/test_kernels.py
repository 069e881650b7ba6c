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
