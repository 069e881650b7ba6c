"""Unit tests for stcat_tpu.ops against independent numpy references."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from stcat_tpu.ops import (
    anchor_sine_embedding,
    box_cxcywh_to_xyxy,
    box_iou_pairwise,
    box_xyxy_to_cxcywh,
    decode_sted,
    gaussian_sted_target,
    generalized_box_iou_pairwise,
    inverse_sigmoid,
    masked_softmax,
    np_box_iou,
    sine_position_embedding_2d,
    sine_time_embedding,
)


def test_box_conversions_roundtrip():
    rng = np.random.RandomState(0)
    cxcywh = rng.uniform(0.2, 0.6, size=(7, 4)).astype(np.float32)
    xyxy = box_cxcywh_to_xyxy(jnp.asarray(cxcywh))
    back = box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), cxcywh, atol=1e-6)
    # manual check of one element
    np.testing.assert_allclose(
        np.asarray(xyxy)[0],
        [
            cxcywh[0, 0] - cxcywh[0, 2] / 2,
            cxcywh[0, 1] - cxcywh[0, 3] / 2,
            cxcywh[0, 0] + cxcywh[0, 2] / 2,
            cxcywh[0, 1] + cxcywh[0, 3] / 2,
        ],
        atol=1e-6,
    )


def test_iou_known_values():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0]])
    iou, union = box_iou_pairwise(a, b)
    np.testing.assert_allclose(np.asarray(iou), [1.0 / 7.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(union), [7.0], atol=1e-6)
    # identical boxes
    iou2, _ = box_iou_pairwise(a, a)
    np.testing.assert_allclose(np.asarray(iou2), [1.0], atol=1e-6)


def test_giou_known_values():
    # disjoint boxes: IoU 0, enclosing area 4x1, union 2 -> giou = -(4-2)/4 = -0.5
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[3.0, 0.0, 4.0, 1.0]])
    giou = generalized_box_iou_pairwise(a, b)
    np.testing.assert_allclose(np.asarray(giou), [-0.5], atol=1e-6)
    # perfect overlap -> 1
    giou2 = generalized_box_iou_pairwise(a, a)
    np.testing.assert_allclose(np.asarray(giou2), [1.0], atol=1e-6)


def test_np_box_iou_matrix():
    b1 = np.array([[0, 0, 2, 2], [0, 0, 1, 1]], dtype=np.float64)
    b2 = np.array([[1, 1, 3, 3]], dtype=np.float64)
    m = np_box_iou(b1, b2)
    assert m.shape == (2, 1)
    np.testing.assert_allclose(m[0, 0], 1.0 / 7.0)
    np.testing.assert_allclose(m[1, 0], 0.0)


def test_inverse_sigmoid_inverts():
    x = jnp.asarray([0.1, 0.5, 0.9])
    y = inverse_sigmoid(x)
    np.testing.assert_allclose(1 / (1 + np.exp(-np.asarray(y))), np.asarray(x), atol=1e-5)
    # clamped at extremes: finite
    assert np.isfinite(np.asarray(inverse_sigmoid(jnp.asarray([0.0, 1.0])))).all()


def test_masked_softmax():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 100.0]])
    mask = jnp.asarray([[True, True, True, False]])
    p = np.asarray(masked_softmax(logits, mask))
    assert p[0, 3] == 0.0
    expected = np.exp([1.0, 2.0, 3.0])
    expected /= expected.sum()
    np.testing.assert_allclose(p[0, :3], expected, rtol=1e-5)


def test_sine_time_embedding_formula():
    d = 8
    te = np.asarray(sine_time_embedding(16, d))
    pos = 3
    for k in range(d // 2):
        w = math.exp(-(2 * k) * math.log(10000.0) / d)
        np.testing.assert_allclose(te[pos, 2 * k], math.sin(pos * w), atol=1e-6)
        np.testing.assert_allclose(te[pos, 2 * k + 1], math.cos(pos * w), atol=1e-6)


def test_anchor_sine_embedding_formula():
    # interleaved sin/cos with paired frequencies over (y, x, w, h) blocks
    pos = jnp.asarray([[0.3, 0.7, 0.2, 0.5]])
    emb = np.asarray(anchor_sine_embedding(pos))
    assert emb.shape == (1, 512)
    scale = 2 * math.pi
    # block 0 = y = pos[...,1]
    y = 0.7 * scale
    dim0 = 10000.0 ** (2 * (0 // 2) / 128)  # = 1
    np.testing.assert_allclose(emb[0, 0], math.sin(y / dim0), atol=1e-6)
    dim1 = 10000.0 ** (2 * (1 // 2) / 128)  # = 1 (paired)
    np.testing.assert_allclose(emb[0, 1], math.cos(y / dim1), atol=1e-6)
    # block 1 = x at offset 128
    x = 0.3 * scale
    np.testing.assert_allclose(emb[0, 128], math.sin(x), atol=1e-6)
    # frequency decay: feature 2k uses 10000^(2k/128)
    k = 10
    dim = 10000.0 ** (2 * k / 128)
    np.testing.assert_allclose(emb[0, 2 * k], math.sin(y / dim), atol=1e-6)


def test_sine_position_embedding_2d_shape_and_norm():
    mask = jnp.ones((2, 5, 7), dtype=bool)
    pe = np.asarray(sine_position_embedding_2d(mask, num_pos_feats=4))
    assert pe.shape == (2, 5, 7, 8)
    # with a full mask, normalized cumsum at the last row/col ~= scale
    # feature 0 of the y block at the last row: sin(2*pi*y/(y_max+eps)) ~ sin(2*pi)
    np.testing.assert_allclose(pe[0, -1, 0, 0], math.sin(2 * math.pi * 5 / (5 + 1e-6)), atol=1e-5)
    # partially padded mask changes normalization per-image
    mask2 = jnp.asarray(np.pad(np.ones((1, 3, 7), bool), ((0, 0), (0, 2), (0, 0))))
    pe2 = np.asarray(sine_position_embedding_2d(mask2, num_pos_feats=4))
    assert not np.allclose(pe2[0, 2], pe[0, 2])


def test_gaussian_sted_target():
    tgt = np.asarray(gaussian_sted_target(10, jnp.asarray([3]), sigma=2.0))
    assert tgt.shape == (1, 10)
    np.testing.assert_allclose(tgt.sum(), 1.0, atol=1e-6)
    assert tgt[0].argmax() == 3
    # symmetric around the center
    np.testing.assert_allclose(tgt[0, 2], tgt[0, 4], rtol=1e-5)


def test_decode_sted_picks_best_pair():
    t = 8
    logits = np.full((1, t, 2), -5.0, dtype=np.float32)
    logits[0, 2, 0] = 5.0  # start peak at 2
    logits[0, 6, 1] = 5.0  # end peak at 6
    s, e = decode_sted(jnp.asarray(logits), jnp.ones((1, t), bool))
    assert (int(s[0]), int(e[0])) == (2, 6)


def test_decode_sted_respects_duration_and_order():
    t = 8
    logits = np.zeros((1, t, 2), dtype=np.float32)
    logits[0, 7, 0] = 10.0  # start peak beyond duration
    logits[0, 7, 1] = 10.0
    mask = np.zeros((1, t), bool)
    mask[0, :5] = True
    s, e = decode_sted(jnp.asarray(logits), jnp.asarray(mask))
    assert int(s[0]) < int(e[0]) <= 4
    # strict s < e even when the same frame dominates both
    logits2 = np.zeros((1, t, 2), dtype=np.float32)
    logits2[0, 3, 0] = 10.0
    logits2[0, 3, 1] = 10.0
    s2, e2 = decode_sted(jnp.asarray(logits2), jnp.ones((1, t), bool))
    assert int(s2[0]) < int(e2[0])


def test_gaussian_sted_target_masked():
    """Masked form: zero mass on padding, normalized over valid frames, and
    identical to the unmasked form when nothing is padded."""
    mask = jnp.asarray(np.asarray([[True] * 6 + [False] * 4]))
    tgt = np.asarray(gaussian_sted_target(10, jnp.asarray([3]), sigma=2.0, time_mask=mask))
    np.testing.assert_array_equal(tgt[0, 6:], 0.0)
    np.testing.assert_allclose(tgt.sum(), 1.0, atol=1e-6)
    full = jnp.ones((1, 10), bool)
    np.testing.assert_allclose(
        np.asarray(gaussian_sted_target(10, jnp.asarray([3]), 2.0, time_mask=full)),
        np.asarray(gaussian_sted_target(10, jnp.asarray([3]), 2.0)),
        rtol=1e-6,
    )
