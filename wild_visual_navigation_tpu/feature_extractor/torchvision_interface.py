"""CNN feature-pyramid interface (ResNet family).

TPU-native equivalent of the reference TorchVisionInterface
(/root/reference/wild_visual_navigation/feature_extractor/torchvision_interface.py:22-121):
resize + normalize + frozen CNN trunk returning a multiscale feature
dict, consumed by the multiscale sparsify path
(feature_extractor.py:314-366). EfficientNet variants of the reference
are not yet implemented (ResNet-18/50 cover the ablation use)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.resnet import make_resnet, pyramid_feature_dim
from ..ops.resize import center_crop, imagenet_normalize, resize_smaller_edge_nearest


class TorchVisionInterface:
    def __init__(
        self,
        key: Optional[jax.Array] = None,
        model_type: str = "resnet18",
        input_size: int = 448,
        params=None,
        dtype=jnp.bfloat16,
    ):
        self._input_size = input_size
        self._model_type = model_type
        if model_type.startswith("efficientnet"):
            from ..models.efficientnet import make_efficientnet

            self.model = make_efficientnet(model_type, dtype=dtype)
        else:
            self.model = make_resnet(model_type, dtype=dtype)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.model.init(key, jnp.zeros((1, 3, input_size, input_size)))
        self.params = params

        @jax.jit
        def _infer(params, img):
            x = resize_smaller_edge_nearest(img, self._input_size)
            x = center_crop(x, self._input_size)
            x = imagenet_normalize(x)
            return self.model.apply(params, x)

        self._infer = _infer

    @property
    def feature_dim(self) -> int:
        if self._model_type.startswith("efficientnet"):
            from ..models.efficientnet import efficientnet_pyramid_dim

            return efficientnet_pyramid_dim(self._model_type)
        return pyramid_feature_dim(self._model_type)

    def inference(self, img: jnp.ndarray) -> dict:
        """(B, 3, H, W) in [0,1] -> {"layer1".."layer4": (B, C_i, H_i, W_i)}."""
        return self._infer(self.params, img)
