"""STEGO segmentation interface (ViT backbone + STEGO head + clustering).

TPU-native replacement for the reference StegoInterface
(/root/reference/wild_visual_navigation/feature_extractor/stego_interface.py:18-135),
which loads the `stego_cocostuff27_vit_base_5.ckpt` Lightning
checkpoint. Same surface: `inference()` computes 90-d code features and
two segmentations (cluster-probe classes and per-image k-means
clusters), bilinear-upsampled code and nearest-upsampled predictions
(stego_interface.py:104-109). Optional mean-field CRF refinement
(ops/crf.py) mirrors the reference's `run_crf` flag (default off,
matching stego_interface.py:31-39).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.stego_head import StegoHead, cosine_kmeans
from ..models.vit import make_vit
from ..ops.resize import center_crop, imagenet_normalize, interpolate_bilinear, resize_smaller_edge_nearest


class StegoInterface:
    def __init__(
        self,
        key: Optional[jax.Array] = None,
        input_size: int = 448,
        n_image_clusters: int = 20,
        run_clustering: bool = True,
        run_crf: bool = False,
        backbone_params=None,
        head_params=None,
        attention_impl: Optional[str] = None,
        dtype=jnp.bfloat16,
    ):
        self._run_crf = run_crf
        if attention_impl is None:
            from .dino import _default_attention_impl

            attention_impl = _default_attention_impl()
        self._input_size = input_size
        self._n_image_clusters = n_image_clusters
        self._run_clustering = run_clustering
        # The reference checkpoint is STEGO-cocostuff27 on DINO ViT-B/8.
        self.vit = make_vit("dino", "vit_base", 8, attention_impl=attention_impl, dtype=dtype)
        self.head = StegoHead(in_dim=self.vit.cfg.embed_dim, code_dim=90, n_classes=27)

        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        dummy = jnp.zeros((1, 3, input_size, input_size))
        if backbone_params is None:
            backbone_params = self.vit.init(k1, dummy)
        if head_params is None:
            n_tokens = (input_size // 8) ** 2
            head_params = self.head.init(k2, jnp.zeros((1, n_tokens, self.vit.cfg.embed_dim)))
        self.backbone_params = backbone_params
        self.head_params = head_params

        self._features = None
        self._cluster_segments = None
        self._linear_segments = None

        @partial(jax.jit, static_argnames=("out_h", "out_w", "n_clusters", "run_clustering"))
        def _infer(bparams, hparams, img, kmeans_key, out_h, out_w, n_clusters, run_clustering):
            x = resize_smaller_edge_nearest(img, self._input_size)
            x = center_crop(x, self._input_size)
            x = imagenet_normalize(x)
            out = self.vit.apply(bparams, x)
            hp, wp = out["grid"]
            B = img.shape[0]
            res = self.head.apply(hparams, out["patch_tokens"])
            code = res["code"]  # (B, N, 90)
            cluster_pred = jnp.argmax(res["cluster_logits"], axis=-1)  # (B, N)
            linear_pred = jnp.argmax(res["linear_logits"], axis=-1)

            if run_clustering:
                keys = jax.random.split(kmeans_key, B)
                km_labels = jax.vmap(lambda c, k: cosine_kmeans(c, k, n_clusters=n_clusters)[0])(code, keys)
            else:
                km_labels = cluster_pred

            code_hw = code.reshape(B, hp, wp, -1).transpose(0, 3, 1, 2)
            code_up = interpolate_bilinear(code_hw, out_h, out_w)

            def up_nearest(pred):
                grid = pred.reshape(B, hp, wp).astype(jnp.int32)
                iy = jnp.clip(jnp.floor(jnp.arange(out_h) * (hp / out_h)).astype(jnp.int32), 0, hp - 1)
                ix = jnp.clip(jnp.floor(jnp.arange(out_w) * (wp / out_w)).astype(jnp.int32), 0, wp - 1)
                return grid[:, iy, :][:, :, ix]

            return code_up, up_nearest(km_labels), up_nearest(linear_pred)

        self._infer_fn = _infer

    @property
    def input_size(self) -> int:
        return self._input_size

    def inference(self, img: jnp.ndarray, key: Optional[jax.Array] = None):
        """img: (B, 3, H, W) in [0,1]. Populates .features (B, 90, H, W),
        .cluster_segments (B, H, W), .linear_segments (B, H, W) and
        returns (features, cluster_segments). The ViT sees the square
        center crop (reference stego_interface semantics). Raw images
        keep the reference's square (H, H) output
        (stego_interface.py:104-105 sets new_features_size = (H, H));
        inputs already at NETWORK size (smaller edge == input_size)
        upsample to the full (H, W) so rectangular network configs get
        maps at their configured shape."""
        if key is None:
            key = jax.random.PRNGKey(0)
        H, W = img.shape[2], img.shape[3]
        if min(H, W) != self._input_size:
            W = H  # reference raw-image semantics: square maps
        code, cluster, linear = self._infer_fn(
            self.backbone_params,
            self.head_params,
            img,
            key,
            out_h=H,
            out_w=W,
            n_clusters=self._n_image_clusters,
            run_clustering=self._run_clustering,
        )
        if self._run_crf:
            # Mean-field CRF refinement of both segmentations against
            # the (resized, square-cropped) guide image — the reference's
            # run_crf option (stego_interface.py:31-39).
            from ..ops.crf import crf_refine_labels
            from ..ops.resize import resize_image

            # guide at the output shape: square targets keep the
            # resize+center-crop semantics, rectangles resize directly
            guide_full = resize_image(img, H, W)

            def refine(pred, n_cls):
                return jnp.stack([
                    crf_refine_labels(pred[b], guide_full[b], n_cls) for b in range(pred.shape[0])
                ])

            cluster = refine(cluster, self._n_image_clusters if self._run_clustering else 27)
            linear = refine(linear, 27)
        self._features = code
        self._cluster_segments = cluster
        self._linear_segments = linear
        return code, cluster

    @property
    def features(self):
        return self._features

    @property
    def cluster_segments(self):
        return self._cluster_segments

    @property
    def linear_segments(self):
        return self._linear_segments
