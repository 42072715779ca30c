"""STEGO segmentation head + on-device clustering (flax).

TPU-native equivalent of the external `stego` package the reference's
StegoInterface wraps (/root/reference/wild_visual_navigation/
feature_extractor/stego_interface.py:13-135): a small projection head
distills ViT features into a low-dim "code" space (90-d for the
cocostuff checkpoint the reference loads), plus
  * a cluster probe — learned class centers, cosine-similarity argmax
    (STEGO's unsupervised classes, e.g. 27 for cocostuff);
  * a linear probe — supervised logits;
  * per-image k-means over codes (`run_clustering`,
    stego_interface.py:31-39, n_image_clusters=20) as jittable Lloyd
    iterations with cosine distance — replacing the reference's CPU
    sklearn-style clustering.
CRF post-processing lives in ops/crf.py (mean-field ConvCRF) and is
wired through StegoInterface(run_crf=True).
"""

from __future__ import annotations

from functools import partial
import flax.linen as nn
import jax
import jax.numpy as jnp


class StegoHead(nn.Module):
    """code = linear(feats) + nonlinear(feats), STEGO's projection."""

    in_dim: int = 768  # ViT-B/8 features (the reference's checkpoint)
    code_dim: int = 90
    n_classes: int = 27
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> dict:
        """feats: (B, N, in_dim) patch features.

        Returns {"code": (B, N, code_dim), "cluster_logits": (B, N,
        n_classes) cosine similarities, "linear_logits": ...}.
        """
        h = feats.astype(self.dtype)
        linear = nn.Dense(self.code_dim, dtype=self.dtype, name="cluster1")(h)
        nl = nn.Dense(self.in_dim, dtype=self.dtype, name="cluster2_fc1")(h)
        nl = nn.relu(nl)
        nl = nn.Dense(self.code_dim, dtype=self.dtype, name="cluster2_fc2")(nl)
        code = linear + nl

        centers = self.param(
            "cluster_probe", nn.initializers.normal(0.02), (self.n_classes, self.code_dim)
        )
        code_n = code / (jnp.linalg.norm(code, axis=-1, keepdims=True) + 1e-8)
        cent_n = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-8)
        cluster_logits = jnp.einsum("bnd,kd->bnk", code_n, cent_n)

        linear_logits = nn.Dense(self.n_classes, dtype=self.dtype, name="linear_probe")(code)
        return {"code": code, "cluster_logits": cluster_logits, "linear_logits": linear_logits}


@partial(jax.jit, static_argnames=("n_clusters", "iterations"))
def cosine_kmeans(code: jnp.ndarray, key: jax.Array, n_clusters: int = 20, iterations: int = 10):
    """Per-image k-means over (N, D) codes with cosine distance.

    Replaces the reference's per-image clustering
    (stego_interface.py:73-109 `run_clustering`). Deterministic
    farthest-point-style init from a provided key. Returns (labels (N,),
    centers (n_clusters, D)).
    """
    N, D = code.shape
    x = code / (jnp.linalg.norm(code, axis=-1, keepdims=True) + 1e-8)

    # Init: random distinct points (with replacement when the cluster
    # count exceeds the token count — tiny inputs; surplus clusters
    # collapse and stay empty).
    idx = jax.random.choice(key, N, shape=(n_clusters,), replace=n_clusters > N)
    centers = x[idx]

    def body(_, centers):
        cn = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-8)
        sim = jnp.dot(x, cn.T, preferred_element_type=jnp.float32)  # (N, K)
        labels = jnp.argmax(sim, axis=-1)
        onehot = jax.nn.one_hot(labels, n_clusters, dtype=jnp.float32)
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=0)[:, None]
        return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centers)

    centers = jax.lax.fori_loop(0, iterations, body, centers)
    cn = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-8)
    labels = jnp.argmax(jnp.dot(x, cn.T, preferred_element_type=jnp.float32), axis=-1)
    return labels.astype(jnp.int32), centers
