"""Convert torch DINO/DINOv2/ResNet checkpoints to this framework's flax params.

The reference downloads pretrained backbones from torch hub at runtime
(stego.backbones.backbone.get_backbone, dino_interface.py:12,45); this
environment has no egress, so conversion is an offline tool: point it
at a checkpoint file you obtained elsewhere and it writes a msgpack
params file the interfaces accept via `backbone_params=`.

Usage:
    python tools/convert_dino_weights.py --ckpt dino_deitsmall8_pretrain.pth \
        --backbone dino --backbone_type vit_small --patch_size 8 \
        --out assets/checkpoints/dino_vits8.msgpack

The name mapping is deterministic (torch hub DINO/DINOv2 naming -> the
flax modules in models/vit.py, which were written to mirror it):
    cls_token, pos_embed, register_tokens         -> same name
    patch_embed.proj.{weight,bias}                -> patch_embed.{kernel(OIHW->HWIO), bias}
    blocks.N.norm{1,2}.{weight,bias}              -> block_N.norm{1,2}.{scale,bias}
    blocks.N.attn.qkv.{weight,bias}               -> block_N.attn.qkv.{kernel(T), bias}
    blocks.N.attn.proj.{weight,bias}              -> block_N.attn.proj.{kernel(T), bias}
    blocks.N.mlp.fc{1,2}.{weight,bias}            -> block_N.mlp.fc{1,2}.{kernel(T), bias}
    blocks.N.ls{1,2}.gamma                        -> block_N.ls{1,2}_gamma
    norm.{weight,bias}                            -> norm.{scale,bias}
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path
from typing import Dict

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def convert_dino_state_dict(state: Dict[str, np.ndarray]) -> dict:
    """torch state_dict (name -> numpy array) -> flax params dict
    matching models/vit.py::VisionTransformer."""
    p: dict = {}

    def put(path, value):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(value, dtype=np.float32)

    for name, w in state.items():
        w = np.asarray(w, dtype=np.float32)
        if name in ("cls_token", "pos_embed", "register_tokens"):
            put([name], w)
        elif name == "patch_embed.proj.weight":
            put(["patch_embed", "kernel"], w.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        elif name == "patch_embed.proj.bias":
            put(["patch_embed", "bias"], w)
        elif name in ("norm.weight",):
            put(["norm", "scale"], w)
        elif name in ("norm.bias",):
            put(["norm", "bias"], w)
        elif name == "mask_token":
            continue  # unused by the dense-feature path
        else:
            m = re.match(r"blocks\.(\d+)\.(.*)", name)
            if not m:
                continue  # heads etc. not needed
            i, rest = int(m.group(1)), m.group(2)
            blk = f"block_{i}"
            if rest.startswith("norm1.") or rest.startswith("norm2."):
                ln, kind = rest.split(".")
                put([blk, ln, "scale" if kind == "weight" else "bias"], w)
            elif rest in ("ls1.gamma", "gamma_1"):
                put([blk, "ls1_gamma"], w)
            elif rest in ("ls2.gamma", "gamma_2"):
                put([blk, "ls2_gamma"], w)
            elif rest.startswith("attn."):
                _, mod, kind = rest.split(".")
                if kind == "weight":
                    put([blk, "attn", mod, "kernel"], w.T)
                else:
                    put([blk, "attn", mod, "bias"], w)
            elif rest.startswith("mlp."):
                _, mod, kind = rest.split(".")
                if kind == "weight":
                    put([blk, "mlp", mod, "kernel"], w.T)
                else:
                    put([blk, "mlp", mod, "bias"], w)
    return {"params": p}


def convert_resnet_state_dict(state: Dict[str, np.ndarray]) -> dict:
    """torchvision resnet state_dict -> models/resnet.py::ResNetPyramid."""
    p: dict = {}

    def put(path, value):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(value, dtype=np.float32)

    def bn(dst, src_prefix):
        put(dst + ["scale"], state[f"{src_prefix}.weight"])
        put(dst + ["bias"], state[f"{src_prefix}.bias"])
        put(dst + ["mean"], state[f"{src_prefix}.running_mean"])
        put(dst + ["var"], state[f"{src_prefix}.running_var"])

    put(["conv1", "kernel"], np.asarray(state["conv1.weight"]).transpose(2, 3, 1, 0))
    bn(["bn1"], "bn1")
    for name in state:
        m = re.match(r"layer(\d)\.(\d+)\.conv(\d)\.weight", name)
        if m:
            s, b, c = m.groups()
            put([f"layer{s}_{b}", f"conv{c}", "kernel"], np.asarray(state[name]).transpose(2, 3, 1, 0))
        m = re.match(r"layer(\d)\.(\d+)\.bn(\d)\.weight", name)
        if m:
            s, b, c = m.groups()
            bn([f"layer{s}_{b}", f"bn{c}"], f"layer{s}.{b}.bn{c}")
        m = re.match(r"layer(\d)\.(\d+)\.downsample\.0\.weight", name)
        if m:
            s, b = m.groups()
            put([f"layer{s}_{b}", "downsample_conv", "kernel"], np.asarray(state[name]).transpose(2, 3, 1, 0))
            bn([f"layer{s}_{b}", "downsample_bn"], f"layer{s}.{b}.downsample.1")
    return {"params": p}


def _tree_shapes(t, prefix=""):
    out = {}
    for k, v in t.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, key))
        else:
            out[key] = tuple(v.shape)
    return out


def verify_against_model(params: dict, backbone: str, backbone_type: str, patch_size: int, input_size: int = 224):
    """Initialize the flax model and check the converted tree has the
    same structure and shapes."""
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models.vit import make_vit

    vit = make_vit(backbone, backbone_type, patch_size, attention_impl="xla")
    ref = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, input_size, input_size)))
    ref_shapes = _tree_shapes(ref["params"])
    got_shapes = _tree_shapes(params["params"])
    missing = set(ref_shapes) - set(got_shapes)
    extra = set(got_shapes) - set(ref_shapes)
    mismatched = {k: (ref_shapes[k], got_shapes[k]) for k in set(ref_shapes) & set(got_shapes)
                  if ref_shapes[k] != got_shapes[k] and "pos_embed" not in k}
    if missing or extra or mismatched:
        raise ValueError(f"conversion mismatch: missing={sorted(missing)} extra={sorted(extra)} shapes={mismatched}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--arch", choices=["vit", "resnet"], default="vit")
    ap.add_argument("--backbone", default="dino")
    ap.add_argument("--backbone_type", default="vit_small")
    ap.add_argument("--patch_size", type=int, default=8)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch
    from flax import serialization

    sd = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    if args.arch == "vit":
        params = convert_dino_state_dict(sd)
        verify_against_model(params, args.backbone, args.backbone_type, args.patch_size)
    else:
        params = convert_resnet_state_dict(sd)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    print(f"wrote {args.out}")


def load_converted(path: str):
    """Load a converted msgpack params file for `backbone_params=`."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


if __name__ == "__main__":
    main()
