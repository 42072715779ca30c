"""Backbone timing sweep — the reference's test_dino_time_settings.py
harness (sweep sizes x models x patch sizes x trials -> table), on TPU.

Usage:
    python benchmarks/bench_sweep.py [--trials 20] [--out results/sweep.csv]

Sweeps the ViT zoo at the reference's operating points ({112, 224, 448}
px, vit_small/vit_base, patch {8, 14, 16}) plus the flash-vs-xla
attention comparison, and prints a CSV (and per-row stdout).
"""

from __future__ import annotations

import argparse
import csv
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    # long chains amortize the relay's fixed warmup (see bench.py)
    ap.add_argument("--trials", type=int, default=40)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--sizes", type=int, nargs="+", default=[112, 224, 448])
    ap.add_argument("--attention", type=str, nargs="+", default=None,
                    help="attention impls to sweep (default: flash+xla on TPU, xla on CPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models.vit import dense_features, make_vit

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    configs = [
        ("dino", "vit_small", 8),
        ("dino", "vit_small", 16),
        ("dino", "vit_base", 8),
        ("dino", "vit_base", 16),
        ("dinov2", "vit_small", 14),
        ("dinov2", "vit_base", 14),
    ]
    rows = []
    for backbone, btype, patch in configs:
        attns = args.attention or (["flash", "xla"] if on_tpu else ["xla"])
        for attn in attns:
            vit = make_vit(backbone, btype, patch, attention_impl=attn)
            params = None
            for size in args.sizes:
                size_eff = (size // patch) * patch
                img = jax.random.uniform(jax.random.PRNGKey(0), (args.batch, 3, size_eff, size_eff))
                if params is None:
                    params = vit.init(jax.random.PRNGKey(1), img[:1])
                fn = jax.jit(lambda p, x: dense_features(vit, p, x))
                try:
                    float(jnp.sum(fn(params, img)))  # compile + true completion
                    # distinct HOST-generated inputs per trial: the test
                    # env's TPU relay memoizes deterministic on-device
                    # computation lineages, so even distinct jax.random
                    # inputs can be served from cache — host randomness
                    # cannot (see bench.py docstring)
                    import numpy as _np

                    rng = _np.random.RandomState(7)
                    imgs = [
                        jax.device_put(rng.rand(args.batch, 3, size_eff, size_eff).astype(_np.float32))
                        for _ in range(args.trials)
                    ]
                    jax.block_until_ready(imgs)
                    # chain iterations through a data dependency: the
                    # relay can fan independent dispatches across a chip
                    # pool; chaining measures ONE chip (see bench.py)
                    t0 = time.time()
                    carry = 0.0
                    for im in imgs:
                        out = fn(params, im + carry * 1e-12)
                        carry = out[0, 0, 0, 0]
                    float(carry)  # value download = the only true fence
                    dt = (time.time() - t0) / args.trials
                except Exception as e:  # OOM at large sizes etc.
                    print(f"SKIP {backbone}_{btype}/{patch} {size_eff}px {attn}: {type(e).__name__}")
                    continue
                row = {
                    "backbone": f"{backbone}_{btype}", "patch": patch, "size": size_eff,
                    "attention": attn, "batch": args.batch,
                    "ms_per_batch": round(dt * 1e3, 3),
                    "images_per_sec": round(args.batch / dt, 2),
                }
                rows.append(row)
                print(row)

    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
