"""Throughput of every production FEATURE MODE through its fused
product path (dino is the headline, bench.py; this covers the rest):

  * stego       — ViT-B/8 @448 (S=3137, flash long-seq) -> STEGO code
                  head -> per-image cosine k-means -> code pooling ->
                  per-pixel MLP scoring (the reference's stego/stego
                  mode, feature_extractor.py:237-249);
  * torchvision — resnet50 pyramid -> multiscale pooling -> scoring
                  (torchvision mode, feature_extractor.py:139-169);
  * anomaly     — dino backbone + LinearRnvp flow scoring
                  (the anomaly-detection production mode).

Each mode runs its `frames_batch` native-batch program (B=4, the
config-5 camera count) with the chained value-fenced protocol
(bench.py method notes).

Run: timeout 1800 python benchmarks/bench_feature_modes.py
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

SIZE = 448
B = 4
ROUNDS = 4


def _fence_all(res):
    """Reduce EVERY FrameResult field to one scalar. Fencing only
    traversability[:, 0, 0] (the r3 form) let XLA dead-code-eliminate
    the k-means / segment / confidence branches that never feed that
    one pixel — the stego number it produced (61.4 img/s) was a
    backbone-only measurement (exp_stego_decompose.py: full == backbone
    to 0.1 ms). Production consumes every field, so the bench must."""
    import jax.numpy as jnp

    vals = (res.traversability, res.confidence, res.features,
            res.feat_valid, res.segments, res.edges, res.edge_valid,
            res.centers)
    return sum(jnp.sum(v.astype(jnp.float32)) for v in vals)


def _measure(fn, params_fn, gen, iters):
    import jax.numpy as jnp

    base = gen()
    out = fn(*params_fn(), base)
    float(jnp.asarray(out).ravel()[0])
    rates = []
    for r in range(ROUNDS):
        carry = jnp.zeros(())
        t0 = time.time()
        for i in range(iters):
            out = fn(*params_fn(), base + carry * 1e-12 + i * 1e-9)
            carry = jnp.asarray(out).ravel()[0]
        float(carry)
        dt = time.time() - t0
        if r > 0:
            rates.append(iters * B / dt)
    return round(statistics.median(rates), 1), [round(x, 1) for x in rates]


def main():
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.utils.confidence_generator import (
        ConfidenceConfig,
        confidence_init,
    )

    key = jax.random.PRNGKey(0)
    cg_cfg, cg_state = ConfidenceConfig(), confidence_init()
    gen = jax.jit(lambda: jax.random.uniform(key, (B, 3, SIZE, SIZE)))
    results = {}

    # ---------------- stego ----------------
    from wild_visual_navigation_tpu.feature_extractor.stego import StegoInterface
    from wild_visual_navigation_tpu.runtime.fused import build_fused_stego_frame_fn

    stego = StegoInterface(input_size=SIZE, attention_impl="auto")
    mlp90 = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": 90, "hidden_sizes": [64, 32, 1], "reconstruction": True,
                            "dtype": jnp.bfloat16},
    })
    mp90 = mlp90.init(jax.random.PRNGKey(1), jnp.zeros((1, 90)))
    stego_fn = build_fused_stego_frame_fn(stego, mlp90, cg_cfg, SIZE, jit_compile=False)

    def stego_call(sp, mp, st, imgs):
        res = stego_fn.frames_batch(sp, mp, st, imgs)
        return _fence_all(res)

    rate, rounds = _measure(
        jax.jit(stego_call),
        lambda: ((stego.backbone_params, stego.head_params), mp90, cg_state),
        gen, iters=6,
    )
    results["stego_vitb8_448px"] = {"images_per_sec": rate, "rounds": rounds}

    # ---------------- torchvision (resnet50 pyramid) ----------------
    from wild_visual_navigation_tpu.feature_extractor.torchvision_interface import (
        TorchVisionInterface,
    )
    from wild_visual_navigation_tpu.runtime.fused import build_fused_torchvision_frame_fn

    tv = TorchVisionInterface(model_type="resnet50", input_size=SIZE)
    D_tv = tv.feature_dim
    mlp_tv = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D_tv, "hidden_sizes": [256, 32, 1],
                            "reconstruction": True, "dtype": jnp.bfloat16},
    })
    mp_tv = mlp_tv.init(jax.random.PRNGKey(2), jnp.zeros((1, D_tv)))
    tv_fn = build_fused_torchvision_frame_fn(tv, mlp_tv, cg_cfg, SIZE, jit_compile=False)

    def tv_call(tp, mp, st, imgs):
        res = tv_fn.frames_batch(tp, mp, st, imgs)
        return _fence_all(res)

    rate, rounds = _measure(
        jax.jit(tv_call), lambda: (tv.params, mp_tv, cg_state), gen, iters=10,
    )
    results["torchvision_resnet50_448px"] = {"images_per_sec": rate, "rounds": rounds}

    # ---------------- anomaly (dino + LinearRnvp flow) ----------------
    from wild_visual_navigation_tpu.feature_extractor.dino import DinoInterface
    from wild_visual_navigation_tpu.runtime.fused import build_fused_frame_fn

    di = DinoInterface(key=jax.random.PRNGKey(3), backbone="dinov2",
                       backbone_type="vit_small", patch_size=14, input_size=SIZE)
    rnvp = get_model({"name": "LinearRnvp",
                      "linear_rnvp_cfg": {"input_size": di.feature_dim}})
    rp = rnvp.init(jax.random.PRNGKey(4), jnp.zeros((1, di.feature_dim)))
    n_cells = (-(-SIZE // 32)) ** 2  # grid cell count — what production passes
    an_fn = build_fused_frame_fn(
        di.vit, rnvp, cg_cfg, input_size=SIZE, segmentation_type="grid",
        num_segments=n_cells, anomaly=True, jit_compile=False,
    )

    def an_call(vp, mp, st, imgs):
        res = an_fn.frames_batch(vp, mp, st, imgs)
        return _fence_all(res)

    rate, rounds = _measure(
        jax.jit(an_call), lambda: (di.params, rp, cg_state), gen, iters=10,
    )
    results["anomaly_dinov2_vits14_448px"] = {"images_per_sec": rate, "rounds": rounds}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
