"""EfficientNet feature-pyramid backbones (flax).

Completes the reference TorchVisionInterface's model zoo
(/root/reference/wild_visual_navigation/feature_extractor/torchvision_interface.py:27-87:
efficientnet_b0/b4/b7 with hand-picked return nodes) alongside the
ResNets in models/resnet.py. Standard MBConv architecture with
squeeze-excitation and swish, compound width/depth scaling, frozen
BatchNorm (inference backbone). Emits a 4-level pyramid at strides
4/8/16/32 like the ResNet trunk, consumed by
ops/segment_ops.segment_pyramid_pool.
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax.numpy as jnp

from .resnet import FrozenBatchNorm

# (expand_ratio, channels, layers, stride, kernel) — EfficientNet-B0 stages.
_B0_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

_SCALING = {  # width_mult, depth_mult
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b4": (1.4, 1.8),
    "efficientnet_b7": (2.0, 3.1),
}


def _round_filters(c: int, width_mult: float, divisor: int = 8) -> int:
    c = c * width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(r * depth_mult))


class SqueezeExcite(nn.Module):
    in_channels: int  # of the block input (torch semantics)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        se_c = max(1, self.in_channels // 4)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_c, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    in_channels: int
    out_channels: int
    expand_ratio: int
    stride: int
    kernel: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inp = x
        c_mid = self.in_channels * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.Conv(c_mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(x)
            x = FrozenBatchNorm(c_mid, name="expand_bn")(x)
            x = nn.silu(x)
        pad = self.kernel // 2
        x = nn.Conv(
            c_mid, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=pad, feature_group_count=c_mid, use_bias=False, dtype=self.dtype, name="dw_conv",
        )(x)
        x = FrozenBatchNorm(c_mid, name="dw_bn")(x)
        x = nn.silu(x)
        x = SqueezeExcite(self.in_channels, self.dtype, name="se")(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(x)
        x = FrozenBatchNorm(self.out_channels, name="project_bn")(x)
        if self.stride == 1 and self.in_channels == self.out_channels:
            x = x + inp
        return x


class EfficientNetPyramid(nn.Module):
    """EfficientNet trunk emitting the stride-4/8/16/32 pyramid."""

    width_mult: float = 1.0
    depth_mult: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> dict:
        """img: (B, 3, H, W) normalized -> {"layer1".."layer4"} NCHW."""
        x = img.transpose(0, 2, 3, 1).astype(self.dtype)
        stem_c = _round_filters(32, self.width_mult)
        x = nn.Conv(stem_c, (3, 3), (2, 2), padding=1, use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = FrozenBatchNorm(stem_c, name="stem_bn")(x)
        x = nn.silu(x)

        out = {}
        taps = {1: "layer1", 2: "layer2", 4: "layer3", 6: "layer4"}  # stage idx -> level
        c_in = stem_c
        for si, (e, c, r, s, k) in enumerate(_B0_STAGES):
            c_out = _round_filters(c, self.width_mult)
            for bi in range(_round_repeats(r, self.depth_mult)):
                stride = s if bi == 0 else 1
                x = MBConv(c_in, c_out, e, stride, k, self.dtype, name=f"stage{si}_{bi}")(x)
                c_in = c_out
            if si in taps:
                out[taps[si]] = x.transpose(0, 3, 1, 2).astype(jnp.float32)
        return out


def make_efficientnet(model_type: str = "efficientnet_b0", dtype=jnp.bfloat16) -> EfficientNetPyramid:
    if model_type not in _SCALING:
        raise ValueError(f"unknown efficientnet {model_type}; have {sorted(_SCALING)}")
    w, d = _SCALING[model_type]
    return EfficientNetPyramid(width_mult=w, depth_mult=d, dtype=dtype)


def efficientnet_pyramid_dim(model_type: str) -> int:
    w, _ = _SCALING[model_type]
    return sum(_round_filters(c, w) for c in (24, 40, 112, 320))
