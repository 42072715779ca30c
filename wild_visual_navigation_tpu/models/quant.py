"""int8 quantized matmuls for the frozen backbone (W8A8).

VERDICT r2 #5 / r4 #5: the remaining single-chip throughput lever
above the softmax-VPU floor. The v5e MXU runs s8 x s8 -> s32 at 2x the
bf16 rate (394 vs 197 TOPS), so the ViT's Dense matmuls
(qkv/proj/fc1/fc2 — where the backbone's FLOPs live) can halve their
MXU time.

Two activation-quantization schemes:

  * DYNAMIC (quant="int8"): activations symmetric per-tensor with the
    scale computed in-graph per call (max |x| / 127) — no calibration,
    correct for any input distribution, but pays a full abs-max
    reduction over every activation tensor per matmul;
  * STATIC (quant="int8_static", VERDICT r4 #5): activation scales are
    CALIBRATED constants (per-layer abs-max recorded over sample
    batches in a flax "quant_cal" variable collection —
    vit.py::calibrate_int8_static), deleting the per-call reduction
    entirely. Out-of-range activations at inference clip at +/-127.

Both: weights symmetric per-output-channel int8
(scale_j = max_i |W_ij| / 127), int32 accumulation on the MXU, fp32
rescale + bias. Weights are quantized ON THE FLY inside the traced
program from the unchanged fp32/bf16 param pytree — checkpoints,
converters, and the param-naming contract
(tools/convert_dino_weights.py) stay identical.

`attention_scores_int8` additionally runs the attention q@k^T and p@v
matmuls on the int8 MXU path (the last non-int8 matmuls at ViT-B @644,
where S=2117 makes the S^2 score work significant) — opt-in via
attention_impl="xla_int8".

Opt-in via make_vit(..., quant=...); the fp32/bf16 paths remain the
parity defaults. Tolerance vs fp32 features is pinned in
tests/test_models.py. Measured economics at the config-5 shape:
benchmarks/exp_int8_vitb.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_symmetric(x: jnp.ndarray, axis=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x -> (int8 values, fp32 scale). Symmetric: q = round(x / s),
    s = amax/127 (s floored to avoid 0/0 on all-zero slices)."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None) -> jnp.ndarray:
    """y = x @ kernel + bias with the matmul on the int8 MXU path.

    x: (..., in) bf16/fp32; kernel: (in, out) fp param. Returns fp32
    cast back to x.dtype by the caller if desired."""
    xq, sx = quantize_symmetric(x)  # per-tensor dynamic
    return _int8_matmul_bias(xq, sx, kernel, bias)


def int8_dense_static(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None, x_scale: jnp.ndarray
) -> jnp.ndarray:
    """Static-activation variant: x_scale is a calibrated per-tensor
    CONSTANT, so the per-call abs-max reduction over the activations —
    the overhead the dynamic path pays on every matmul — disappears;
    out-of-calibration activations clip at +/-127. Weights stay
    per-out-channel, quantized on the fly."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127).astype(jnp.int8)
    return _int8_matmul_bias(xq, x_scale, kernel, bias)


def _int8_matmul_bias(xq, sx, kernel, bias):
    wq, sw = quantize_symmetric(kernel, axis=0)  # per-out-channel (1, out)
    lead = xq.shape[:-1]
    acc = jax.lax.dot_general(
        xq.reshape(-1, xq.shape[-1]), wq,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw)  # (N, out) * (1, out)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.reshape(*lead, kernel.shape[1])


def attention_scores_int8(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, sm_scale: float = 1.0
) -> jnp.ndarray:
    """Attention with BOTH matmuls on the int8 MXU path (VERDICT r4 #5:
    at ViT-B @644 the S=2117 score matmuls are the last non-int8 MXU
    work). q/k/v: (B, H, S, Dh).

      * scores = q8 @ k8^T, int32 accumulate, fp32 rescale + softmax
        (the softmax itself stays fp32 — it is VPU work either way);
      * probs quantize with a PER-ROW scale (max_k p / 127): diffuse
        attention rows have p ~ 1/S everywhere, so a global [0,1]
        scale would round them all to zero (measured 34% error at
        S=257); the row max keeps ~7 bits of relative precision per
        row. The row maxes come free from the softmax's own
        max-subtraction structure (one more S-reduction on a tensor
        already in registers);
      * p8 @ v8 int32, per-row rescale.

    Per-tensor dynamic scales for q, k, v (three small reductions vs
    the two S^2-sized matmuls they unlock)."""
    qq, sq = quantize_symmetric(q)
    kq, sk = quantize_symmetric(k)
    vq, sv = quantize_symmetric(v)
    s = jax.lax.dot_general(
        qq, kq, (((3,), (3,)), ((0, 1), (0, 1))), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (sq * sk * sm_scale)
    p = jax.nn.softmax(s, axis=-1)
    p_scale = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-9) / 127.0
    pq = jnp.round(p / p_scale).astype(jnp.int8)
    out = jax.lax.dot_general(
        pq, vq, (((3,), (2,)), ((0, 1), (0, 1))), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (p_scale * sv)
    return out.astype(q.dtype)
