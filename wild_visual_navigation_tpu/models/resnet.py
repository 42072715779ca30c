"""ResNet feature-pyramid backbones (flax).

TPU-native equivalent of the reference's TorchVisionInterface
(/root/reference/wild_visual_navigation/feature_extractor/torchvision_interface.py:22-121),
which uses torchvision's `create_feature_extractor` with hand-picked
return nodes on resnet18/resnet50 (and efficientnet variants). Here the
ResNet emits the 4 stage outputs as a feature pyramid
{"layer1": (B, C1, H/4, W/4), ..., "layer4": (B, C4, H/32, W/32)} —
the multiscale sparsify path pools them per segment and concatenates.

BatchNorm runs in inference mode with stored running stats (the
backbone is frozen in this framework, like the reference's
torch.no_grad usage); weight conversion from torchvision checkpoints
maps conv/bn parameters 1:1 (tools/convert_dino_weights.py).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with stored statistics only (inference mode)."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (x - mean) * inv + bias


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.filters, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.filters, name="bn2")(y)
        if residual.shape[-1] != self.filters or self.strides != 1:
            residual = nn.Conv(self.filters, (1, 1), (self.strides, self.strides), use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.filters, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        out_f = self.filters * 4
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.filters, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.filters, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_f, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(out_f, name="bn3")(y)
        if residual.shape[-1] != out_f or self.strides != 1:
            residual = nn.Conv(out_f, (1, 1), (self.strides, self.strides), use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = FrozenBatchNorm(out_f, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetPyramid(nn.Module):
    """ResNet trunk returning the 4-stage feature pyramid."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # resnet18
    bottleneck: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> dict:
        """img: (B, 3, H, W) normalized -> dict of NCHW pyramids."""
        x = img.transpose(0, 2, 3, 1).astype(self.dtype)  # NHWC
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        block = Bottleneck if self.bottleneck else BasicBlock
        out = {}
        filters = [64, 128, 256, 512]
        for stage, (n_blocks, f) in enumerate(zip(self.stage_sizes, filters)):
            for b in range(n_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = block(f, strides, self.dtype, name=f"layer{stage+1}_{b}")(x)
            out[f"layer{stage+1}"] = x.transpose(0, 3, 1, 2).astype(jnp.float32)  # NCHW
        return out


_RESNETS = {
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), bottleneck=False),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True),
    "resnet50_dino": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True),
}


def make_resnet(model_type: str = "resnet18", dtype=jnp.bfloat16) -> ResNetPyramid:
    if model_type not in _RESNETS:
        raise ValueError(f"unknown resnet {model_type}; have {sorted(_RESNETS)}")
    return ResNetPyramid(dtype=dtype, **_RESNETS[model_type])


def pyramid_feature_dim(model_type: str) -> int:
    """Total channel count of the concatenated 4-stage pyramid."""
    if model_type == "resnet18":
        return 64 + 128 + 256 + 512
    return 256 + 512 + 1024 + 2048
