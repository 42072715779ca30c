"""BASELINE config-5 benchmark: multi-camera DINOv2 ViT-B @ 644 px with
interleaved training.

Simulates the full-pipeline operating point (BASELINE.md config 5):
N cameras' frames batched into one fused inference program (ViT-B/14 at
644 px -> 2116 tokens/frame) while train steps run interleaved on the
same chip. Reports per-camera sustainable frame rate and the training
rate achieved alongside.

Method (see bench.py): distinct host-generated inputs via device_put,
every iteration chained through a data dependency on the previous
outputs (both the inference result and the train loss), and the timing
fenced by an actual value download at the end — block_until_ready is
not a reliable fence through the dev relay.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cameras", type=int, default=4)
    ap.add_argument("--size", type=int, default=644)
    ap.add_argument("--backbone_type", type=str, default="vit_base")
    # Long chains matter: the relay's fixed warmup (~1-2 s) amortizes
    # over the chain; at 10 iters it inflated the cycle time ~2x.
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.models.vit import make_vit
    from wild_visual_navigation_tpu.runtime.fused import build_fused_batch_fn
    from wild_visual_navigation_tpu.utils import (
        TraversabilityLossConfig,
        TravBatch,
        confidence_init,
        traversability_loss,
    )

    size = (args.size // 14) * 14
    B = args.cameras
    vit = make_vit("dinov2", args.backbone_type, 14, attention_impl="xla")
    key = jax.random.PRNGKey(0)
    vit_params = vit.init(key, jnp.zeros((1, 3, size, size)))
    D = vit.cfg.embed_dim
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True},
    })
    mlp_params = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))
    infer = build_fused_batch_fn(vit, mlp, size, B)

    # training side (head-only, batch 8 x 100 segments)
    tx = optax.adam(1e-3)
    opt_state = tx.init(mlp_params)
    cg = confidence_init()
    loss_cfg = TraversabilityLossConfig()

    @jax.jit
    def train_step(params, opt_state, cg, x, y, yv):
        batch = TravBatch(x=x.reshape(-1, D), y=y.reshape(-1), y_valid=yv.reshape(-1),
                          sample_valid=jnp.ones((x.shape[0] * x.shape[1],), bool))

        def lf(p):
            res = mlp.apply(p, batch.x)
            loss, aux, cg2 = traversability_loss(loss_cfg, batch, res, cg)
            return loss, cg2

        (loss, cg2), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt2, cg2, loss

    import numpy as np

    rng = np.random.RandomState(0)
    frames = [jax.device_put(rng.rand(B, 3, size, size).astype(np.float32)) for i in range(args.iters)]
    xs = [jax.device_put(rng.randn(8, 100, D).astype(np.float32)) for i in range(args.iters)]
    ys = [jax.device_put(rng.rand(8, 100).astype(np.float32)) for i in range(args.iters)]
    yvs = [jax.device_put(rng.rand(8, 100) < 0.5) for i in range(args.iters)]
    jax.block_until_ready((frames, xs, ys, yvs))

    # compile + complete (value download is the only true fence)
    fr = infer(vit_params, mlp_params, frames[0])
    mlp_params, opt_state, cg, loss = train_step(mlp_params, opt_state, cg, xs[0], ys[0], yvs[0])
    float(jnp.sum(fr) + loss)

    t0 = time.time()
    carry = jnp.zeros(())
    for i in range(args.iters):
        fr = infer(vit_params, mlp_params, frames[i] + carry * 1e-12)
        mlp_params, opt_state, cg, loss = train_step(
            mlp_params, opt_state, cg, xs[i] + carry * 1e-12, ys[i], yvs[i])
        carry = jnp.sum(fr) * 1e-9 + loss * 1e-9
    float(carry)  # value fence
    dt = (time.time() - t0) / args.iters

    result = {
        "config": f"{args.cameras}cam_dinov2_{args.backbone_type}_{size}px_with_training",
        "cycle_ms": round(dt * 1e3, 2),
        "per_camera_hz": round(1.0 / dt, 2),
        "train_steps_per_sec_interleaved": round(1.0 / dt, 2),
        "images_per_sec": round(B / dt, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
