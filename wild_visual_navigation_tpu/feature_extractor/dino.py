"""DINO/DINOv2 dense-feature interface.

TPU-native replacement for the reference DinoInterface
(/root/reference/wild_visual_navigation/feature_extractor/dino_interface.py:15-108):
aspect-preserving NEAREST resize + center crop + ImageNet normalization,
frozen ViT forward, bilinear (align_corners=True) upsample of the patch
features back to (H, H) pixels — all fused into one jitted program per
input shape (the reference's torchvision transform ran as separate
kernels with intermediate HBM traffic).

Weights: random-init by default (tests / architecture benchmarks), or
converted torch-hub checkpoints via tools/convert_dino_weights.py
(zero-egress environments cannot download them at runtime).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.vit import VisionTransformer, make_vit
from ..ops.resize import center_crop, imagenet_normalize, interpolate_bilinear, resize_smaller_edge_nearest


def _default_attention_impl() -> str:
    # "auto" resolves per trace-static shape (models/vit.py): the
    # Pallas flash kernel in its proven S~1k batched pocket, bf16
    # attention scores elsewhere; the backbone is frozen so
    # forward-only is fine. CPU (tests) keeps the XLA einsum path —
    # Pallas on CPU needs interpret mode.
    import jax

    return "auto" if jax.devices()[0].platform == "tpu" else "xla"


class DinoInterface:
    def __init__(
        self,
        key: Optional[jax.Array] = None,
        backbone: str = "dino",
        input_size: int = 448,
        backbone_type: str = "vit_small",
        patch_size: int = 8,
        attention_impl: Optional[str] = None,
        params=None,
        dtype=jnp.bfloat16,
        quant: Optional[str] = None,
    ):
        """quant="int8": opt-in W8A8 backbone matmuls on the int8 MXU
        path (models/quant.py; ~1.5% mean feature error, tolerance-
        pinned in tests/test_models.py). fp checkpoints load as-is."""
        if attention_impl is None:
            attention_impl = _default_attention_impl()
        self._input_size = input_size
        self._backbone = backbone
        self._backbone_type = backbone_type
        self._patch_size = patch_size
        self._quant = quant
        self.vit: VisionTransformer = make_vit(
            backbone, backbone_type, patch_size, attention_impl=attention_impl, dtype=dtype, quant=quant
        )
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.vit.init(key, jnp.zeros((1, 3, input_size, input_size)))
        elif quant == "int8_static" and "quant_cal" not in params:
            # converted fp checkpoints carry no calibration collection —
            # seed the zero scales so apply() finds the variables; a
            # calibrate() pass is still required before inference
            seeded = self.vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, input_size, input_size)))
            params = {**params, "quant_cal": seeded["quant_cal"]}
        self.params = params

        @partial(jax.jit, static_argnames=("out_h", "out_w"))
        def _infer(params, img, out_h, out_w):
            H, W = img.shape[2], img.shape[3]
            ps = self._patch_size
            if min(H, W) == self._input_size and H % ps == 0 and W % ps == 0:
                # Already at network size and patch-aligned: feed the
                # full frame (a no-op for the square case — resize +
                # center-crop would not change it; for rectangular
                # configs this keeps the whole field of view instead
                # of silently cropping to a square).
                x = img
            else:
                x = resize_smaller_edge_nearest(img, self._input_size)
                x = center_crop(x, self._input_size)
            x = imagenet_normalize(x)
            out = self.vit.apply(params, x)
            hp, wp = out["grid"]
            B = img.shape[0]
            feat = out["patch_tokens"].reshape(B, hp, wp, -1).transpose(0, 3, 1, 2)
            return interpolate_bilinear(feat, out_h, out_w)

        self._infer = _infer

    @property
    def feature_dim(self) -> int:
        return self.vit.cfg.embed_dim

    @property
    def input_size(self) -> int:
        return self._input_size

    @property
    def backbone(self) -> str:
        return self._backbone

    @property
    def backbone_type(self) -> str:
        return self._backbone_type

    @property
    def vit_patch_size(self) -> int:
        return self._patch_size

    def calibrate(self, sample_batches) -> bool:
        """Record static int8 activation scales from sample frames.

        sample_batches: iterable of (B, 3, H, W) RGB-in-[0,1] batches.
        Each is preprocessed exactly like inference (resize/crop when
        not at network size, ImageNet normalization) before the
        calibration forward (models/vit.py::calibrate_int8_static), so
        the recorded per-layer abs-max matches what the deployed
        program sees. Replaces self.params in place (value-only: the
        scales are traced operands, so already-compiled programs keep
        their cache). Returns True when a calibration ran; False for
        non-static quant modes."""
        if self._quant != "int8_static":
            return False
        from ..models.vit import calibrate_int8_static

        prepped = []
        for img in sample_batches:
            img = jnp.asarray(img)
            H, W = img.shape[2], img.shape[3]
            ps = self._patch_size
            if not (min(H, W) == self._input_size and H % ps == 0 and W % ps == 0):
                img = center_crop(resize_smaller_edge_nearest(img, self._input_size), self._input_size)
            prepped.append(imagenet_normalize(img))
        self.params = calibrate_int8_static(self.vit, self.params, prepped)
        return True

    def inference(self, img: jnp.ndarray) -> jnp.ndarray:
        """img: (B, 3, H, W) RGB in [0, 1] -> dense features.

        Raw images keep the reference's exact semantics: upsample to
        the SQUARE (H, H) (dino_interface.py:87-91 sets
        new_features_size = (H, H) even for wide inputs — the W pad is
        commented out there). An input already at NETWORK size
        (smaller edge == input_size — i.e. the runtime resized it)
        returns (B, D, H, W) over the full shape instead: patch-aligned
        rectangles feed the ViT the full frame; misaligned ones see
        the reference's resize+square-crop but still upsample to
        (H, W), so rectangular network configs get maps at their
        configured shape rather than a silent square."""
        H, W = img.shape[2], img.shape[3]
        if min(H, W) == self._input_size:
            return self._infer(self.params, img, H, W)
        return self._infer(self.params, img, H, H)
