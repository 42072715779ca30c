"""int8 quantized matmul for the frozen backbone (W8A8, dynamic).

VERDICT r2 #5: the remaining single-chip throughput lever above the
softmax-VPU floor. The v5e MXU runs s8 x s8 -> s32 at 2x the bf16
rate (394 vs 197 TOPS), so the ViT's Dense matmuls (qkv/proj/fc1/fc2 —
where the backbone's FLOPs live) can halve their MXU time.

Scheme (standard post-training dynamic quantization):
  * weights: symmetric per-output-channel int8
    (scale_j = max_i |W_ij| / 127);
  * activations: symmetric per-tensor DYNAMIC int8
    (scale = max |x| / 127, computed in-graph per call — no
    calibration pass, correct for any input distribution);
  * accumulate int32 on the MXU, rescale fp32, fp32 bias.

Weights are quantized ON THE FLY inside the traced program from the
unchanged fp32/bf16 param pytree — checkpoints, converters, and the
param-naming contract (tools/convert_dino_weights.py) stay identical;
the per-call quantize pass reads the ~22 MB of ViT-S weights once,
noise against the matmul work at batch >= 8.

Opt-in via make_vit(..., quant="int8"); the fp32/bf16 paths remain
the parity defaults. Tolerance vs fp32 features is pinned in
tests/test_models.py.
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
