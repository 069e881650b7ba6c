"""On-device input preprocessing: uint8 raw frames -> normalized VideoBatch.

The TPU-native replacement for the reference's host-side pixel transforms
(datasets/transforms.py Resize/RandomSizeCrop/Normalize run inside torch
dataloader workers): the host ships raw uint8 frames plus a per-clip affine
resample plan (data/transforms.py TransformPlan), and this jittable op does

    flip -> one bilinear resample (scale_and_translate) -> ImageNet normalize

inside the train/eval step, where it fuses with the backbone's first conv.
Rationale: the resample + normalize of a 64-frame clip is ~50 ms of
GIL-bound numpy on a host core but microseconds of VPU work; shipping uint8
also cuts host->HBM bytes 4x. Numerics: a single bilinear resample with
half-pixel centers and antialias=False is bit-comparable (<=1e-6) to the
reference's torchvision F.resize for the eval path, and composes the train
augmentation chain into one resample (sub-LSB smoothing difference on the
resize->crop->resize branch only).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.batch import RawVideoBatch, VideoBatch


def _resample_clip(frames, scale_yx, off_yx, out_hw: Tuple[int, int]):
    """Bilinear-resample one clip [T, Hs, Ws, 3] along y_src = a*y_out + b.

    jax.image.scale_and_translate convention: output index o samples input
    coordinate (o + 0.5 - t)/s - 0.5, so s = 1/a and t = 0.5 - (b + 0.5)/a
    (verified exact vs half-pixel numpy bilinear). Out-of-canvas taps are
    renormalized by the kernel (equivalent to edge clamp).
    """
    t, ch = frames.shape[0], frames.shape[-1]
    s = 1.0 / scale_yx
    trans = 0.5 - (off_yx + 0.5) / scale_yx
    return jax.image.scale_and_translate(
        frames,
        (t, out_hw[0], out_hw[1], ch),
        (1, 2),
        s,
        trans,
        "linear",
        antialias=False,
    )


def _resample_yuv_clip(y, cbcr, scale_yx, off_yx, out_hw: Tuple[int, int]):
    """One clip, 4:2:0 planes -> [T, H, W, 3] RGB in [0, 1].

    The chroma upsample costs nothing extra: both planes go through the SAME
    bilinear resample to the output grid, the chroma one with the affine
    rewritten into plane coordinates. JFIF siting puts chroma sample j at
    luma coordinate 2j + 0.5, so a luma sampling line u = a*x_out + b
    becomes the chroma line v = (u - 0.5)/2 = (a/2)*x_out + (b - 0.5)/2.
    Color: libjpeg/PIL full-range BT.601 (JPEG and JFIF-video convention).
    """
    out_y = _resample_clip(y[..., None], scale_yx, off_yx, out_hw)[..., 0]
    out_c = _resample_clip(
        cbcr, scale_yx / 2.0, (off_yx - 0.5) / 2.0, out_hw
    )
    # the chroma zero point is the uint8 value 128, i.e. 128/255 after the
    # [0,1] scaling -- NOT 0.5 (a 0.5-LSB bias otherwise tints every pixel)
    cb = out_c[..., 0] - (128.0 / 255.0)
    cr = out_c[..., 1] - (128.0 / 255.0)
    r = out_y + 1.402 * cr
    g = out_y - 0.344136 * cb - 0.714136 * cr
    b = out_y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)


def preprocess(
    raw: RawVideoBatch,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
) -> VideoBatch:
    """Jittable: RawVideoBatch -> VideoBatch (float32 frames, masks built)."""
    H, W = raw.out_canvas

    if raw.frames_y is not None:
        # 4:2:0 ingest: flip each plane across its own width (exactly
        # equivalent to flipping the full-res canvas: plane position
        # Ws/2-1-v sits at luma coordinate Ws-1.5-2v, which is where the
        # flipped-luma chroma line lands -- see _resample_yuv_clip)
        y = raw.frames_y
        c = raw.frames_cbcr
        y = jnp.where(raw.flip[:, None, None, None], y[:, :, :, ::-1], y)
        c = jnp.where(raw.flip[:, None, None, None, None], c[:, :, :, ::-1, :], c)
        y = y.astype(jnp.float32) * (1.0 / 255.0)
        c = c.astype(jnp.float32) * (1.0 / 255.0)
        f = jax.vmap(_resample_yuv_clip, in_axes=(0, 0, 0, 0, None))(
            y, c, raw.affine_scale, raw.affine_off, (H, W)
        )
    else:
        f = raw.frames_u8
        # horizontal flip of the whole source canvas; the host folded the
        # resulting (Ws - src_w) offset into affine_off for flipped clips
        f = jnp.where(raw.flip[:, None, None, None, None], f[:, :, :, ::-1, :], f)
        f = f.astype(jnp.float32) * (1.0 / 255.0)

        f = jax.vmap(_resample_clip, in_axes=(0, 0, 0, None))(
            f, raw.affine_scale, raw.affine_off, (H, W)
        )

    mean_v = jnp.asarray(mean, jnp.float32)
    std_v = jnp.asarray(std, jnp.float32)
    f = (f - mean_v) / std_v

    # valid-region masks in the target canvas; zero the padding like the
    # host batcher does (canvas initialized to 0.0, data/batching.py)
    rows = jnp.arange(H)[None, :] < raw.out_size[:, 0, None]   # [B, H]
    cols = jnp.arange(W)[None, :] < raw.out_size[:, 1, None]   # [B, W]
    pixel_valid = (
        rows[:, None, :, None] & cols[:, None, None, :]
    ) & raw.frame_valid[:, :, None, None]                      # [B, T, H, W]
    f = jnp.where(pixel_valid[..., None], f, 0.0)

    return VideoBatch(
        frames=f,
        frame_valid=raw.frame_valid,
        pixel_valid=pixel_valid,
        token_ids=raw.token_ids,
        token_valid=raw.token_valid,
    )
