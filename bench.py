"""Benchmark: flagship inference throughput on one chip — BOTH scoring paths.

Measures the BASELINE north-star metric (BASELINE.md): images/sec for
the full per-frame pipeline — DINOv2 ViT-S/14 backbone at 448 px plus
the SimpleMLP traversability head — in the two scoring orders the
framework supports:

  * pixelwise (HEADLINE, the reference's actual per-pixel math,
    /root/reference/.../dino_interface.py:87-91 + quick_start.py:184-194
    and this repo's runtime/fused.py per-pixel branch): bilinear
    upsample of the D=384-channel patch features to 448x448, then the
    MLP over all 200,704 pixels — traversability AND confidence maps
    (reconstruction MSE -> confidence_inference), ~111 GFLOP +
    ~0.5 GB HBM traffic per frame;
  * patchres (the TPU-native fast path, opt-in in the product via
    score_at_patch_res + tolerance-tested): score the 1,024 patch
    tokens and bilinearly upsample the 1-channel maps, ~64 GFLOP/frame.

`vs_baseline` for both divides by the reference's own design gate of
10 images/sec/camera (the rate gate in
wild_visual_navigation_ros/config/.../default.yaml:39 — the reference
publishes no measured throughput, see BASELINE.md). MFU is matmul+
attention FLOPs over the v5e bf16 peak (197 TFLOP/s).

Configuration (the TPU perf profile, all covered by tolerance tests):
flash attention (padding-tight single 1152 tile at S=1025), bf16
LayerNorm IO, ImageNet normalization folded into the patch embedding,
bf16 MLP scoring, lax.scan-chained batches per dispatch.

Measurement method (validated with a known-FLOP probe against this
environment's TPU relay, whose block_until_ready can return before
execution completes): on-device generated inputs, every dispatch
chained through a data dependency, timing fenced by an actual value
download, first round discarded, median of 3 rounds reported —
run-to-run contention on the shared relay swings single measurements
up to ~10x (see benchmarks/exp_*.py).

Prints ONE JSON line; the headline metric/value is the pixelwise path,
with the patchres entry nested under "patchres".
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

# ---- relay-outage supervision -------------------------------------
# The shared TPU relay has outage windows in which ONE in-flight RPC
# never returns: the PJRT client's main thread then waits on a futex
# behind an epoll thread forever, while a FRESH process connects and
# runs fine (observed 2026-08-20: probe.py at 25 ms p50, then minutes
# later the same binary hangs indefinitely pre-first-dispatch).
# Nothing in-process can recover a swallowed RPC, so the benchmark
# runs in a child process: a hung attempt costs one timeout, not the
# round's artifact. `--inner` marks the child (the actual measurement).
ATTEMPTS = 3
ATTEMPT_TIMEOUT_S = 480  # healthy full run ~3-5 min incl. compiles


def supervise() -> int:
    last_err = "unknown"
    for attempt in range(ATTEMPTS):
        try:
            proc = subprocess.run(
                [sys.executable, "-u", __file__, "--inner"],
                stdout=subprocess.PIPE, timeout=ATTEMPT_TIMEOUT_S,
            )
        except subprocess.TimeoutExpired:
            last_err = f"attempt {attempt + 1} hung >{ATTEMPT_TIMEOUT_S}s (relay outage window)"
            print(last_err, file=sys.stderr)
            time.sleep(10)  # let the relay window pass before reconnecting
            continue
        for line in (proc.stdout or b"").decode().splitlines():
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(parsed, dict) and "metric" in parsed:
                print(line)
                return 0
        last_err = f"attempt {attempt + 1} exited rc={proc.returncode} without a result line"
        print(last_err, file=sys.stderr)
        time.sleep(10)
    print(json.dumps({
        "metric": "dinov2_vits14_448px_pixelwise_traversability_throughput",
        "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0,
        "error": f"all {ATTEMPTS} attempts failed: {last_err}",
    }))
    return 1

BASELINE_IMAGES_PER_SEC = 10.0  # reference per-camera rate gate (design point)
SIZE = 448
ROUNDS = 3
PEAK_TFLOPS = 197.0  # v5e bf16

# matmul+attention FLOPs per image, backbone: 12 blocks x (12 D^2 per
# token x S + 4 S^2 D attention) + patch embed, S=1025, D=384 -> ~63.5e9.
FLOP_BACKBONE = 63.5e9
# MLP head per row: 2*(384*256 + 256*32 + 32*385) = 237,632 FLOPs.
FLOP_MLP_ROW = 2 * (384 * 256 + 256 * 32 + 32 * 385)
FLOP_PATCHRES = FLOP_BACKBONE + FLOP_MLP_ROW * (SIZE // 14) ** 2  # ~63.7e9
# the reference's per-pixel math would run FLOP_MLP_ROW at every pixel
# (~111 GFLOP/frame); the Gram/fused scorer algebraically ELIMINATES
# most of it (Dense_0 at patch resolution; mid+Gram layers per pixel),
# so the hardware executes roughly:
#   Dense_0 at 1024 patch rows + per-pixel (256-ch 2-tap lerp +
#   256x32 mid + 32x32 Gram + 32 dot) ~ 19.6k FLOP/px -> ~3.9e9
FLOP_PIXELWISE_REFMATH = FLOP_BACKBONE + FLOP_MLP_ROW * SIZE * SIZE  # ~111.2e9
FLOP_PIXELWISE_EXECUTED = (
    FLOP_BACKBONE
    + 2 * 384 * 256 * (SIZE // 14) ** 2
    + (4 * 256 + 2 * (256 * 32 + 32 * 32 + 32)) * SIZE * SIZE
)  # ~67.6e9 actually executed


def _measure(pipeline, params, gen_batch, batch_images: int, iters: int):
    """Carry-chained, value-fenced median rate over ROUNDS (first
    discarded)."""
    import jax.numpy as jnp

    base = gen_batch()
    float(jnp.asarray(pipeline(*params, base)).ravel()[0])  # compile + complete
    rates = []
    for r in range(ROUNDS + 1):
        t0 = time.time()
        carry = jnp.zeros(())
        for i in range(iters):
            out = pipeline(*params, base + carry * 1e-12 + i * 1e-9)
            carry = jnp.asarray(out).ravel()[0]
        float(carry)  # value fence: forces true completion through the relay
        dt = time.time() - t0
        if r > 0:  # first round absorbs relay warmup
            rates.append(iters * batch_images / dt)
    return statistics.median(rates), rates


def main():
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.models.vit import dense_features, fold_imagenet_normalize, make_vit
    from wild_visual_navigation_tpu.ops.pixelwise import pixelwise_score
    from wild_visual_navigation_tpu.utils.confidence_generator import (
        ConfidenceConfig,
        confidence_init,
    )

    vit = make_vit("dinov2", "vit_small", 14, attention_impl="flash", ln_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    vit_params = fold_imagenet_normalize(vit.init(key, jnp.zeros((1, 3, SIZE, SIZE))))
    D = vit.cfg.embed_dim
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True,
                            "dtype": jnp.bfloat16},
    })
    mlp_params = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))
    cg_cfg = ConfidenceConfig()
    cg_state = confidence_init()

    # ---------------- pixelwise: the reference's per-pixel math ----------------
    # Restructured exactly (ops/pixelwise.py::pixelwise_score, Gram
    # method: Dense_0 before the upsample by linearity, MXU-matmul
    # bilinear, reconstruction MSE expanded through the last layer's
    # K×K Gram matrix so no D-channel pixel-resolution tensor exists —
    # equivalence-tested): ladder 84 (gather) -> 249 (MXU bilinear)
    # -> 310 (restructured) -> 321 img/s (gram) -> 490 (fused Pallas
    # scorer, ops/pixelwise_fused.py) -> ~600 at batch 48 (the fused
    # kernel keeps pixel-resolution tensors out of HBM, so the batch
    # is no longer capped by the gram path's ~390 MB/frame
    # intermediates; B sweep in benchmarks/exp_px_batch.py: 8->506,
    # 16->586, 48->605, 64->565, 96->526).
    PX_BATCH, PX_SCAN, PX_ITERS = 48, 1, 12

    def one_batch_pixelwise(vp, mp, imgs):
        feat = dense_features(vit, vp, imgs)  # (B, D, Hp, Wp)
        return pixelwise_score(mp, feat, SIZE, SIZE, cg_cfg, cg_state, optimized=True)

    @jax.jit
    def pipeline_pixelwise(vp, mp, imgs):  # (SCAN, B, 3, H, W)
        def body(carry, im):
            t, c = one_batch_pixelwise(vp, mp, im + carry * 1e-12)
            # full-map sums: a single-pixel fence would let XLA narrow
            # any non-Pallas scoring path to the fenced pixel (the
            # pallas_call itself is opaque either way). Sum magnitude
            # ~B*H*W*0.5 -> *1e-12 keeps the image perturbation < 1e-5.
            return jnp.sum(t) + jnp.sum(c), (t[:, 0, 0], c[:, 0, 0])

        _, outs = jax.lax.scan(body, jnp.zeros(()), imgs)
        return outs[0]

    # ---------------- patchres: the TPU-native fast path ----------------
    PR_BATCH, PR_SCAN, PR_ITERS = 32, 4, 15

    def make_pipeline_patchres(vitmod):
        def one_batch(vp, mp, imgs):
            feat = dense_features(vitmod, vp, imgs)  # (B, D, Hp, Wp)
            B, Dd, Hp, Wp = feat.shape
            flat = feat.transpose(0, 2, 3, 1).reshape(-1, Dd).astype(jnp.bfloat16)
            out = mlp.apply(mp, flat)
            return out[:, 0].reshape(B, Hp, Wp)

        @jax.jit
        def pipeline(vp, mp, imgs):
            def body(carry, im):
                t = one_batch(vp, mp, im + carry * 1e-12)
                # full-map sum fence (see pipeline_pixelwise)
                return jnp.sum(t), t[:, 0, 0]

            _, outs = jax.lax.scan(body, jnp.zeros(()), imgs)
            return outs

        return pipeline

    pipeline_patchres = make_pipeline_patchres(vit)
    # int8 backbone variant (W8A8 with CALIBRATED static activation
    # scales — the stronger scheme, r5; models/quant.py). Calibration:
    # record per-layer abs-max over 2 sample batches at this shape.
    from wild_visual_navigation_tpu.models.vit import calibrate_int8_static

    vit_int8 = make_vit("dinov2", "vit_small", 14, attention_impl="flash",
                        ln_dtype=jnp.bfloat16, quant="int8_static")
    _v0 = vit_int8.init(jax.random.PRNGKey(2), jnp.zeros((1, 3, SIZE, SIZE)))
    vit_params_int8 = calibrate_int8_static(
        vit_int8,
        {"params": vit_params["params"], "quant_cal": _v0["quant_cal"]},
        [jax.random.uniform(jax.random.fold_in(key, 40 + i), (2, 3, SIZE, SIZE))
         for i in range(2)],
    )
    pipeline_patchres_int8 = make_pipeline_patchres(vit_int8)

    gen_px = jax.jit(lambda: jax.random.uniform(jax.random.fold_in(key, 7), (PX_SCAN, PX_BATCH, 3, SIZE, SIZE)))
    gen_pr = jax.jit(lambda: jax.random.uniform(jax.random.fold_in(key, 8), (PR_SCAN, PR_BATCH, 3, SIZE, SIZE)))

    px_rate, px_rounds = _measure(pipeline_pixelwise, (vit_params, mlp_params), gen_px,
                                  PX_SCAN * PX_BATCH, PX_ITERS)
    pr_rate, pr_rounds = _measure(pipeline_patchres, (vit_params, mlp_params), gen_pr,
                                  PR_SCAN * PR_BATCH, PR_ITERS)
    q_rate, q_rounds = _measure(pipeline_patchres_int8, (vit_params_int8, mlp_params), gen_pr,
                                PR_SCAN * PR_BATCH, PR_ITERS)

    result = {
        "metric": "dinov2_vits14_448px_pixelwise_traversability_throughput",
        "value": round(px_rate, 2),
        "unit": "images/sec",
        "vs_baseline": round(px_rate / BASELINE_IMAGES_PER_SEC, 2),
        "baseline_definition": "reference design gate: 10 img/s/camera rate limit (default.yaml:39); reference publishes no measured throughput",
        # utilization from FLOPs the hardware actually executes (the
        # Gram/fused scorer eliminates most per-pixel MLP FLOPs) —
        # NOT from the reference math's FLOP count, which would
        # overstate MFU ~1.7x and could exceed 1.0 for a fast-enough
        # restructuring
        "mfu": round(px_rate * FLOP_PIXELWISE_EXECUTED / (PEAK_TFLOPS * 1e12), 3),
        "effective_mfu_reference_math": round(
            px_rate * FLOP_PIXELWISE_REFMATH / (PEAK_TFLOPS * 1e12), 3
        ),
        "rounds": [round(x, 1) for x in px_rounds],
        "work": "448^2 per-pixel MLP traversability + confidence maps (reference math, dino_interface.py:87-91)",
        "patchres": {
            "metric": "dinov2_vits14_448px_patchres_traversability_throughput",
            "value": round(pr_rate, 2),
            "vs_baseline": round(pr_rate / BASELINE_IMAGES_PER_SEC, 2),
            "mfu": round(pr_rate * FLOP_PATCHRES / (PEAK_TFLOPS * 1e12), 3),
            "rounds": [round(x, 1) for x in pr_rounds],
            "work": "per-patch-token scoring (1024 rows/frame; the r1/r2 ladder metric: 401 -> 689)",
        },
        "patchres_int8_backbone": {
            "metric": "dinov2_vits14_448px_patchres_int8_static_throughput",
            "value": round(q_rate, 2),
            "vs_baseline": round(q_rate / BASELINE_IMAGES_PER_SEC, 2),
            "rounds": [round(x, 1) for x in q_rounds],
            "work": "opt-in W8A8 backbone, calibrated static activation scales "
                    "(models/quant.py, ~2.8% feature err, tolerance-pinned; "
                    "economics: benchmarks/exp_int8_vitb.py)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(supervise())
