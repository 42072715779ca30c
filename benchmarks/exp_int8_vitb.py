"""Does an int8 backbone win at ViT-B @644 (config-5 shape)?

VERDICT r4 #5. At ViT-S @448 DYNAMIC int8 loses (565 vs 689 img/s).
ViT-B @644 has 4x the matmul FLOPs per token and S=2117, so the MXU
fraction is much higher. This experiment measures, interleaved over
rounds on the same inputs (value-fenced medians, see bench.py method):

  bf16             the production backbone (flash attention)
  int8             W8A8 dynamic activation scales (per-call reductions)
  int8_static      W8A8 with CALIBRATED static activation scales — the
                   per-call reduction deleted (models/quant.py,
                   vit.py::calibrate_int8_static)
  int8_static+att  static dense scales AND both attention matmuls on
                   the int8 MXU path (attention_impl="xla_int8")

plus a PURE-MATMUL decomposition at the exact layer shapes
(N=B*2117 rows; D=768; qkv/fc 768x2304 / 768x3072): bf16 vs int8
dot_general including quant/rescale, isolating where the MXU's 2x int8
peak goes if the end-to-end numbers do not show it (the rescale's fp32
(N, out) intermediate doubles the matmul's HBM write traffic, and
quantizing the activations adds a full read+write sweep — at these
arithmetic intensities the matmuls are bandwidth-bound, so halving MXU
time does not halve wall time).

Also prints the int8_static feature error vs bf16 (cosine + rel-L2) so
a win would be adoptable.

Run: timeout 1800 python benchmarks/exp_int8_vitb.py
"""
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from wild_visual_navigation_tpu.models.vit import (
    calibrate_int8_static,
    dense_features,
    fold_imagenet_normalize,
    make_vit,
)

SIZE = 644
B = 4  # config-5 camera count


def main():
    key = jax.random.PRNGKey(0)
    vit = make_vit("dinov2", "vit_base", 14, attention_impl="flash", ln_dtype=jnp.bfloat16)
    vp = fold_imagenet_normalize(vit.init(key, jnp.zeros((1, 3, SIZE, SIZE))))

    vit_i8 = make_vit("dinov2", "vit_base", 14, attention_impl="flash",
                      ln_dtype=jnp.bfloat16, quant="int8")

    vit_st = make_vit("dinov2", "vit_base", 14, attention_impl="flash",
                      ln_dtype=jnp.bfloat16, quant="int8_static")
    vit_st_att = make_vit("dinov2", "vit_base", 14, attention_impl="xla_int8",
                          ln_dtype=jnp.bfloat16, quant="int8_static")
    # calibration: init the quant_cal collection, record abs-max over
    # sample batches at the production shape
    v_st = vit_st.init(key, jnp.zeros((1, 3, SIZE, SIZE)))
    v_st = {"params": vp["params"], "quant_cal": v_st["quant_cal"]}
    cal_batches = [jax.random.uniform(jax.random.fold_in(key, 50 + i), (B, 3, SIZE, SIZE))
                   for i in range(3)]
    v_st = calibrate_int8_static(vit_st, v_st, cal_batches)

    def mk(vitmod, params):
        @jax.jit
        def f(p, imgs):
            feat = dense_features(vitmod, p, imgs)
            return feat[:, 0, 0, 0]
        return lambda imgs: f(params, imgs)

    pipes = {
        "bf16": mk(vit, vp),
        "int8": mk(vit_i8, vp),
        "int8_static": mk(vit_st, v_st),
        "int8_static+att": mk(vit_st_att, v_st),
    }
    gen = jax.jit(lambda: jax.random.uniform(key, (B, 3, SIZE, SIZE)))
    base = gen()
    for f in pipes.values():
        float(jnp.asarray(f(base)).ravel()[0])

    # feature-error check (int8_static vs bf16, full maps). Random-init
    # DINOv2 layerscale is 1e-5 — blocks are near-identity and quant
    # error vanishes — so gammas are set to 1.0 (trained magnitude) for
    # the ERROR measurement only, exactly as tests/test_models.py does.
    ls1 = jax.tree_util.tree_map_with_path(
        lambda path, l: jnp.ones_like(l)
        if any("ls" in str(getattr(k, "key", "")) for k in path) else l, vp)
    v_st1 = calibrate_int8_static(
        vit_st, {"params": ls1["params"], "quant_cal": v_st["quant_cal"]}, cal_batches)
    fb = dense_features(vit, ls1, base)
    fs = dense_features(vit_st, v_st1, base)
    fb, fs = np.asarray(fb, np.float64), np.asarray(fs, np.float64)
    cos = float(np.sum(fb * fs) / (np.linalg.norm(fb) * np.linalg.norm(fs)))
    rel = float(np.linalg.norm(fb - fs) / np.linalg.norm(fb))
    fa = np.asarray(dense_features(vit_st_att, v_st1, base), np.float64)
    cos_a = float(np.sum(fb * fa) / (np.linalg.norm(fb) * np.linalg.norm(fa)))
    rel_a = float(np.linalg.norm(fb - fa) / np.linalg.norm(fb))

    ITERS = 10
    res = {k: [] for k in pipes}
    for rnd in range(4):
        for name, f in pipes.items():
            carry = jnp.zeros(())
            t0 = time.time()
            for i in range(ITERS):
                out = f(base + carry * 1e-12 + i * 1e-9)
                carry = out[0]
            float(carry)
            dt = time.time() - t0
            if rnd:
                res[name].append(ITERS * B / dt)

    # ---- pure-matmul decomposition at the exact layer shapes ----
    from wild_visual_navigation_tpu.models.quant import int8_dense_static, quantize_symmetric

    N = B * 2117  # rows per multi-camera tick
    shapes = {"qkv_768x2304": (768, 2304), "fc1_768x3072": (768, 3072),
              "fc2_3072x768": (3072, 768)}
    mm = {}
    for tag, (din, dout) in shapes.items():
        x = jax.random.normal(jax.random.fold_in(key, 60), (N, din), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(key, 61), (din, dout), jnp.float32)
        bias = jnp.zeros((dout,), jnp.float32)
        xq, _ = quantize_symmetric(x)
        wq, _ = quantize_symmetric(w, axis=0)

        # Each variant chains M matmuls INSIDE one jitted scan (carry
        # perturbs the next input -> data dependence, no memoization, no
        # per-iteration relay round trip — a per-call fence would
        # measure the ~30 ms relay RTT, not the sub-ms matmul), chains
        # OUTER calls through the device-resident carry, and the single
        # scalar download at the end is the true fence (RTT amortized
        # over OUTER*M matmuls, <5%).
        M = 200
        OUTER = 3

        def _poke(arr, c):
            # fold the carry into ONE element (dynamic_update_slice):
            # a full `x + c` elementwise pass would cost ~40% of the
            # matmul's own time at these shapes and muddy the comparison
            return jax.lax.dynamic_update_slice(
                arr, jnp.asarray(c).astype(arr.dtype).reshape(1, 1), (0, 0))

        # the carry is the FULL-result sum: a single-element readout
        # would let XLA narrow each dot to one row x column (the DCE
        # trap the r4 bench fix documented — first cut here read 795
        # "TFLOP/s", 4x the v5e peak). The sum's extra (N, out) read is
        # identical across variants.
        @jax.jit
        def mm_bf16(x, w, c0):
            def body(c, _):
                y = _poke(x, c * 1e-6) @ w.astype(jnp.bfloat16)
                return jnp.sum(y.astype(jnp.float32)) * 1e-6, None
            c, _ = jax.lax.scan(body, c0, None, length=M)
            return c

        @jax.jit
        def mm_i8_static(x, w, c0):
            def body(c, _):
                y = int8_dense_static(_poke(x, c * 1e-6), w, bias, jnp.float32(4.0 / 127.0))
                return jnp.sum(y) * 1e-6, None
            c, _ = jax.lax.scan(body, c0, None, length=M)
            return c

        @jax.jit
        def mm_i8_raw(xq, wq, c0):
            # the MXU op alone: int8 inputs, int32 accumulate, no
            # quantize/rescale passes
            def body(c, _):
                acc = jax.lax.dot_general(_poke(xq, c % 3), wq, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                return jnp.sum(acc, dtype=jnp.int32) % 1000, None
            c, _ = jax.lax.scan(body, c0, None, length=M)
            return c

        def chained(fn, a, b, c0):
            c = c0
            for _ in range(OUTER):
                c = fn(a, b, c)  # device carry: dispatches queue, no fence
            return float(c)  # the one true fence

        variants = {
            "bf16": lambda r: chained(mm_bf16, x, w, jnp.float32(r)),
            "i8_static_full": lambda r: chained(mm_i8_static, x, w, jnp.float32(r)),
            "i8_mxu_only": lambda r: chained(mm_i8_raw, xq, wq, jnp.int32(r)),
        }
        for vname, call in variants.items():
            call(0)  # compile + complete
        rates = {v: [] for v in variants}
        for rnd in range(3):
            for vname, call in variants.items():
                t0 = time.time()
                call(rnd)  # distinct carry seed -> distinct dispatch
                dt = time.time() - t0
                if rnd:
                    flops = 2 * N * din * dout * M * OUTER
                    rates[vname].append(flops / dt / 1e12)
        mm[tag] = {v: round(statistics.median(r), 2) for v, r in rates.items()}

    out = {
        "shape": f"{B}x3x{SIZE}x{SIZE} dinov2 vit_base S=2117",
        "img_per_sec": {k: round(statistics.median(v), 1) for k, v in res.items()},
        "rounds": {k: [round(x, 1) for x in v] for k, v in res.items()},
        "int8_static_feature_err": {"cosine": round(cos, 5), "rel_l2": round(rel, 4)},
        "int8_static_att_feature_err": {"cosine": round(cos_a, 5), "rel_l2": round(rel_a, 4)},
        "matmul_tflops": mm,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
