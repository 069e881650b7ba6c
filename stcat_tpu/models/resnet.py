"""ResNet-50/101 vision backbone with frozen batch-norm, NHWC, torch-padding parity.

TPU-first choices vs the reference (models/vision_model/backbone.py):
  - NHWC layout end-to-end (XLA:TPU's native conv layout; NCHW costs transposes).
  - FrozenBatchNorm is folded to a per-channel (scale, bias) affine pair held in
    a non-trainable "constants" collection: y = x * scale + bias with
    scale = gamma/sqrt(var+1e-5), bias = beta - mean*scale
    (ref backbone.py:56-66). XLA fuses it into the preceding conv.
  - Explicit torch-style padding ((3,3) for the 7x7 stem, (1,1) for 3x3) so
    feature maps align spatially with converted torchvision weights --
    XLA "SAME" splits padding differently and would shift every activation.
  - Stem + layer1 are always frozen (ref backbone.py:78-85): the optimizer
    masks their updates AND the module cuts the autodiff graph after the
    frozen prefix (frozen_stages) so their backward is never computed,
    matching torch's requires_grad=False cost profile.

The clip's frame axis folds into the batch axis: [B, T, H, W, 3] ->
[B*T, H, W, 3], the embarrassingly-parallel dimension TPUs want to batch over.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """Per-channel affine with constants (never trained, never updated)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.variable(
            "constants", "scale", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        bias = self.variable(
            "constants", "bias", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _conv(features, kernel, stride=1, dilation=1, name=None, dtype=jnp.float32):
    pad = ((kernel // 2) * dilation, (kernel // 2) * dilation)
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=(pad, pad),
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    """torchvision bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + skip."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenBN(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(
            self.planes, 3, self.stride, self.dilation, name="conv2", dtype=self.dtype
        )(out)
        out = FrozenBN(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenBN(self.planes * 4, name="bn3")(out)

        if self.downsample:
            x = _conv(self.planes * 4, 1, self.stride, name="ds_conv", dtype=self.dtype)(x)
            x = FrozenBN(self.planes * 4, name="ds_bn")(x)
        return nn.relu(out + x)


class ResNet(nn.Module):
    """ResNet body returning the layer4 (stride-32) feature map.

    depths: (3, 4, 6, 3) = resnet50; (3, 4, 23, 3) = resnet101.
    dc5: layer4 stride->1 dilation->2 (ref VISION_BACKBONE.DILATION).
    remat_blocks: rematerialize each bottleneck in the backward pass. This
        MUST be per-block: remat over the whole body makes its backward hold
        every recomputed activation at once (~12 GB for 64 frames @416 --
        measured to thrash the TPU runtime into 100x-slower steps); per-block
        remat keeps only block inputs live (~4 GB).
    """

    depths: Sequence[int] = (3, 4, 23, 3)
    dc5: bool = False
    dtype: jnp.dtype = jnp.float32
    remat_blocks: bool = False
    # stages (1-based) remat applies to; early stages hold the big spatial
    # maps, late stages the FLOPs, so (1, 2) trades a little HBM for
    # skipping the layer3/layer4 recompute in the backward
    remat_stages: Sequence[int] = (1, 2, 3, 4)
    # stop_gradient after this stage (0 = stem only, 4 = whole body): the
    # reference trains with stem+layer1 requires_grad=False
    # (backbone.py:78-85), which in torch SKIPS their backward; nothing
    # below a frozen prefix needs gradients (its input is the data), so
    # cutting the graph here removes those backward kernels entirely.
    # The optimizer's "frozen" group mask stays the belt-and-braces guard.
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Stem: 7x7/2 pad 3, maxpool 3x3/2 pad 1 (torch semantics).
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        x = FrozenBN(64, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )

        if self.frozen_stages == 0:
            x = jax.lax.stop_gradient(x)

        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 1 if self.dc5 else 2)
        dilations = (1, 1, 1, 2 if self.dc5 else 1)
        for i, (depth, p, s, d) in enumerate(
            zip(self.depths, planes, strides, dilations)
        ):
            frozen = (i + 1) <= self.frozen_stages
            block_cls = (
                nn.remat(Bottleneck)
                if self.remat_blocks and not frozen
                and (i + 1) in self.remat_stages
                else Bottleneck
            )
            for j in range(depth):
                x = block_cls(
                    planes=p,
                    stride=s if j == 0 else 1,
                    dilation=d,
                    downsample=(j == 0),
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x)
            if frozen:
                x = jax.lax.stop_gradient(x)
        return x  # [N, H/32, W/32, 2048]


def build_resnet(
    name: str,
    dc5: bool,
    dtype: jnp.dtype = jnp.float32,
    depths: Sequence[int] = (),
    remat_blocks: bool = False,
    remat_stages: Sequence[int] = (1, 2, 3, 4),
    frozen_stages: int = 1,
) -> Tuple[ResNet, int]:
    kw = dict(dc5=dc5, dtype=dtype, remat_blocks=remat_blocks,
              remat_stages=tuple(remat_stages), frozen_stages=frozen_stages)
    if depths:
        return ResNet(depths=tuple(depths), **kw), 2048
    if name == "resnet50":
        return ResNet(depths=(3, 4, 6, 3), **kw), 2048
    if name == "resnet101":
        return ResNet(depths=(3, 4, 23, 3), **kw), 2048
    raise ValueError(f"unsupported backbone {name}")


def downsample_mask(pixel_mask: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor downsample of a [.., H, W] bool mask to the feature grid.

    Matches F.interpolate(mask.float(), size).bool() (ref backbone.py:100):
    nearest sampling at index floor(i * H/h').
    """
    h, w = pixel_mask.shape[-2:]
    oh, ow = out_hw
    ys = (jnp.arange(oh, dtype=jnp.float32) * (h / oh)).astype(jnp.int32)
    xs = (jnp.arange(ow, dtype=jnp.float32) * (w / ow)).astype(jnp.int32)
    return pixel_mask[..., ys, :][..., :, xs]
