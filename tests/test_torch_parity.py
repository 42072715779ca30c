"""Numerical parity against torch (CPU) — the ground truth the
reference runs on.

These tests build small torch modules with the reference's exact
semantics (DINO ViT block, F.interpolate bilinear align_corners=True,
nearest resize), push random weights through tools/convert_dino_weights,
and require the flax implementations to match within float tolerance.
This is the strongest evidence the weight converter + architecture are
faithful — converted pretrained checkpoints will then reproduce the
reference's features.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

sys.path.insert(0, "/root/repo/tools")

from wild_visual_navigation_tpu.ops.resize import interpolate_bilinear, resize_nearest


def test_bilinear_align_corners_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 7, 9).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(20, 30), mode="bilinear", align_corners=True).numpy()
    out = np.asarray(interpolate_bilinear(jnp.asarray(x), 20, 30))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_nearest_resize_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 11, 13).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(22, 17), mode="nearest").numpy()
    out = np.asarray(resize_nearest(jnp.asarray(x), 22, 17))
    np.testing.assert_allclose(out, ref, atol=1e-6)


class _TorchDinoBlock(tnn.Module):
    """One pre-norm ViT block with DINO's exact ops."""

    def __init__(self, dim=64, heads=4, layerscale=None):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads
        self.ls = layerscale
        if layerscale is not None:
            self.gamma1 = tnn.Parameter(torch.full((dim,), layerscale))
            self.gamma2 = tnn.Parameter(torch.full((dim,), layerscale))

    def forward(self, x):
        B, N, D = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, self.heads, D // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * (D // self.heads) ** -0.5
        att = att.softmax(dim=-1)
        h = (att @ v).transpose(1, 2).reshape(B, N, D)
        h = self.proj(h)
        if self.ls is not None:
            h = h * self.gamma1
        x = x + h
        h = self.norm2(x)
        h = self.fc2(F.gelu(self.fc1(h)))
        if self.ls is not None:
            h = h * self.gamma2
        return x + h


class _TorchMiniDino(tnn.Module):
    def __init__(self, dim=64, heads=4, depth=2, patch=8, grid=4, layerscale=None):
        super().__init__()
        self.patch_embed = tnn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + grid * grid, dim) * 0.02)
        self.blocks = tnn.ModuleList([_TorchDinoBlock(dim, heads, layerscale) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.grid = grid

    def forward(self, img):
        B = img.shape[0]
        x = self.patch_embed(img).flatten(2).transpose(1, 2)  # (B, N, D)
        x = x + self.pos_embed[:, 1:]
        cls = (self.cls_token + self.pos_embed[:, :1]).expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 1:]  # patch tokens

    def state_dict_dino_names(self):
        sd = {
            "cls_token": self.cls_token.detach().numpy(),
            "pos_embed": self.pos_embed.detach().numpy(),
            "patch_embed.proj.weight": self.patch_embed.weight.detach().numpy(),
            "patch_embed.proj.bias": self.patch_embed.bias.detach().numpy(),
            "norm.weight": self.norm.weight.detach().numpy(),
            "norm.bias": self.norm.bias.detach().numpy(),
        }
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}"
            sd[f"{p}.norm1.weight"] = blk.norm1.weight.detach().numpy()
            sd[f"{p}.norm1.bias"] = blk.norm1.bias.detach().numpy()
            sd[f"{p}.attn.qkv.weight"] = blk.qkv.weight.detach().numpy()
            sd[f"{p}.attn.qkv.bias"] = blk.qkv.bias.detach().numpy()
            sd[f"{p}.attn.proj.weight"] = blk.proj.weight.detach().numpy()
            sd[f"{p}.attn.proj.bias"] = blk.proj.bias.detach().numpy()
            sd[f"{p}.norm2.weight"] = blk.norm2.weight.detach().numpy()
            sd[f"{p}.norm2.bias"] = blk.norm2.bias.detach().numpy()
            sd[f"{p}.mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
            sd[f"{p}.mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
            sd[f"{p}.mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
            sd[f"{p}.mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
            if blk.ls is not None:
                sd[f"{p}.ls1.gamma"] = blk.gamma1.detach().numpy()
                sd[f"{p}.ls2.gamma"] = blk.gamma2.detach().numpy()
        return sd


@pytest.mark.parametrize("layerscale", [None, 1e-1])
def test_vit_matches_torch_dino(layerscale):
    """Converted torch weights must reproduce torch outputs through the
    flax ViT (fp32, XLA attention) within float tolerance."""
    import dataclasses

    from convert_dino_weights import convert_dino_state_dict
    from wild_visual_navigation_tpu.models.vit import ViTConfig, VisionTransformer

    torch.manual_seed(0)
    tmodel = _TorchMiniDino(dim=64, heads=4, depth=2, patch=8, grid=4, layerscale=layerscale).eval()
    img = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(img)).numpy()  # (2, 16, 64)

    cfg = ViTConfig(
        patch_size=8, embed_dim=64, depth=2, num_heads=4,
        num_register_tokens=0, layerscale_init=layerscale, pos_grid_size=4,
    )
    vit = VisionTransformer(cfg, attention_impl="xla", dtype=jnp.float32)
    params = convert_dino_state_dict(tmodel.state_dict_dino_names())
    out = vit.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(img))
    got = np.asarray(out["patch_tokens"])
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_resnet_block_matches_torch():
    """FrozenBatchNorm + BasicBlock vs torch BN(eval) + torchvision-style
    basic block, through the converter."""
    from convert_dino_weights import convert_resnet_state_dict
    from wild_visual_navigation_tpu.models.resnet import make_resnet

    torch.manual_seed(1)

    class TBasic(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.down = stride != 1 or cin != cout
            if self.down:
                self.downsample = tnn.Sequential(tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout))

        def forward(self, x):
            idn = self.downsample(x) if self.down else x
            y = F.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return F.relu(y + idn)

    class TMini(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.layer1 = tnn.Sequential(TBasic(64, 64, 1), TBasic(64, 64, 1))
            self.layer2 = tnn.Sequential(TBasic(64, 128, 2), TBasic(128, 128, 1))
            self.layer3 = tnn.Sequential(TBasic(128, 256, 2), TBasic(256, 256, 1))
            self.layer4 = tnn.Sequential(TBasic(256, 512, 2), TBasic(512, 512, 1))

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.max_pool2d(x, 3, 2, 1)
            outs = []
            for layer in [self.layer1, self.layer2, self.layer3, self.layer4]:
                x = layer(x)
                outs.append(x)
            return outs

    tmodel = TMini().eval()
    # randomize BN stats so the frozen-BN math is actually exercised
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    img = np.random.RandomState(2).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        refs = [o.numpy() for o in tmodel(torch.from_numpy(img))]

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_resnet_state_dict(sd)
    model = make_resnet("resnet18", dtype=jnp.float32)
    pyr = model.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(img))
    for i, ref in enumerate(refs):
        got = np.asarray(pyr[f"layer{i+1}"])
        np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)
