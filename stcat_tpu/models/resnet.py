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
    """Per-channel affine with constants (never trained, never updated).

    setup-style (not compact) so the fused-kernel path can fetch the raw
    (scale, bias) pair via ``consts()`` without applying the affine, while
    keeping the variable tree identical across conv implementations
    (checkpoint compatibility).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self._scale = self.variable(
            "constants", "scale", lambda: jnp.ones((self.features,), jnp.float32)
        )
        self._bias = self.variable(
            "constants", "bias", lambda: jnp.zeros((self.features,), jnp.float32)
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale, bias = self._scale.value, self._bias.value
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)

    def consts(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._scale.value, self._bias.value


class _ConvKernel(nn.Module):
    """Declares an nn.Conv-compatible kernel param and returns it raw.

    Same name ("kernel"), shape ([k, k, Cin, Cout]) and initializer as
    nn.Conv, so a tree built through the fused path loads/saves identically
    to one built through the nn.Conv path.
    """

    features: int
    kernel: int
    in_features: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.in_features, self.features),
            jnp.float32,
        )


def _make_norm(norm: str, features: int, dtype, name: str):
    """Per-block norm factory: "frozenbn" (published recipes) or "gn".

    The GroupNorm variant mirrors ref backbone.py:124-145 (GroupNorm32 on a
    torchvision ResNet): 32 contiguous channel groups, eps 1e-5, trainable
    per-channel affine living in the regular params collection (frozen-stage
    masking is path-based, so stem/layer1 GN affines freeze like the convs).
    """
    if norm == "gn":
        return nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=dtype, name=name
        )
    return FrozenBN(features, name=name)


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
    """torchvision bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + skip.

    conv_impl "pallas" routes stride-1 blocks through the fused Pallas
    block kernel (kernels/conv.py) -- one VMEM-resident program instead of
    ~7 HBM round trips; measured routing set per stage in ResNet. The
    parameter tree is identical in both modes.
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "xla"
    # logical input channel count (param declaration width); 0 = x.shape[-1]
    in_features: int = 0
    norm: str = "frozenbn"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..kernels.conv import use_pallas

        # the fused kernel pre-folds FrozenBN into the conv weights; GN
        # normalizes activations at runtime and cannot fold -> XLA path
        if self.stride == 1 and self.norm == "frozenbn" and use_pallas(self.conv_impl):
            return self._fused(x)
        norm = lambda feats, name: _make_norm(self.norm, feats, self.dtype, name)
        out = _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        out = norm(self.planes, "bn1")(out)
        out = nn.relu(out)
        out = _conv(
            self.planes, 3, self.stride, self.dilation, name="conv2", dtype=self.dtype
        )(out)
        out = norm(self.planes, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = norm(self.planes * 4, "bn3")(out)

        if self.downsample:
            x = _conv(self.planes * 4, 1, self.stride, name="ds_conv", dtype=self.dtype)(x)
            x = norm(self.planes * 4, "ds_bn")(x)
        return nn.relu(out + x)

    def _fused(self, x: jnp.ndarray) -> jnp.ndarray:
        """Fold FrozenBN into conv weights and run the fused block kernel."""
        from ..kernels.conv import BlockWeights, fused_bottleneck

        cin = self.in_features or x.shape[-1]
        p, cout = self.planes, self.planes * 4
        k1 = _ConvKernel(p, 1, cin, name="conv1")()
        s1, c1 = FrozenBN(p, name="bn1").consts()
        k2 = _ConvKernel(p, 3, p, name="conv2")()
        s2, c2 = FrozenBN(p, name="bn2").consts()
        k3 = _ConvKernel(cout, 1, p, name="conv3")()
        s3, c3 = FrozenBN(cout, name="bn3").consts()
        w1 = k1[0, 0] * s1
        if self.downsample:
            kd = _ConvKernel(cout, 1, cin, name="ds_conv")()
            sd, cd = FrozenBN(cout, name="ds_bn").consts()
            wd, bd = kd[0, 0] * sd, cd[None, None]
        else:
            wd = bd = None
        bw = BlockWeights(
            w1=w1, b1=c1[None, None],
            w2=k2 * s2, b2=c2[None, None],
            w3=k3[0, 0] * s3, b3=c3[None, None],
            wd=wd, bd=bd,
        )
        return fused_bottleneck(x.astype(self.dtype), bw, self.dilation)


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
    # "pallas" routes stride-1 bottlenecks of conv_stages through the fused
    # block kernel (kernels/conv.py); stride-2 first blocks stay on XLA.
    conv_impl: str = "xla"
    conv_stages: Sequence[int] = (1, 2, 3, 4)
    # "frozenbn" (published recipes) | "gn" (ref backbone.py:124-145
    # GroupNormBackbone: GroupNorm(32), trainable affine)
    norm: str = "frozenbn"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Stem: 7x7/2 pad 3, maxpool 3x3/2 pad 1 (torch semantics). The stem
        # stays on XLA: a space-to-depth rewrite measured at parity (XLA does
        # it internally), and a fused bias+relu+maxpool Pallas epilogue was
        # built but this Mosaic version rejects its stride-2 parity reshape
        # (docs/STATUS.md roofline notes).
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        x = _make_norm(self.norm, 64, self.dtype, "stem_bn")(x)
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
            impl = self.conv_impl if (i + 1) in self.conv_stages else "xla"
            for j in range(depth):
                cin = (64 if i == 0 else planes[i - 1] * 4) if j == 0 else p * 4
                x = block_cls(
                    planes=p,
                    stride=s if j == 0 else 1,
                    dilation=d,
                    downsample=(j == 0),
                    dtype=self.dtype,
                    conv_impl=impl,
                    in_features=cin,
                    norm=self.norm,
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
    conv_impl: str = "xla",
    conv_stages: Sequence[int] = (1, 2, 3, 4),
) -> Tuple[ResNet, int]:
    # "-gn" suffix selects the GroupNorm variant (ref backbone.py:124-145,
    # cfg names resnet50-gn / resnet101-gn)
    norm = "frozenbn"
    if name.endswith("-gn"):
        norm, name = "gn", name[: -len("-gn")]
    kw = dict(dc5=dc5, dtype=dtype, remat_blocks=remat_blocks,
              remat_stages=tuple(remat_stages), frozen_stages=frozen_stages,
              conv_impl=conv_impl, conv_stages=tuple(conv_stages), norm=norm)
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
