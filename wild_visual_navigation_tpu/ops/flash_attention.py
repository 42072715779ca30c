"""Flash attention (forward) as a Pallas TPU kernel.

The attention kernel for the frozen ViT backbone (DINO/DINOv2) — the
one attention-kernel need identified in SURVEY.md §5. The reference
delegates to torch/stego CUDA kernels; here the ViT's full (non-causal)
self-attention over <=~3200 patch tokens is computed tile-by-tile with
an online softmax so the (S, S) score matrix never round-trips HBM.

Performance status (value-fenced interleaved medians on v5e — see
bench.py for why naive timing lies in this environment): with
padding-tight blocks this kernel beats XLA attention at every batched
ViT-zoo sequence length measured — S=1025 759 vs 646 img/s backbone-
only, S=2117 (ViT-B @644) 36.0 vs 42.5 ms full-forward, S=3137
(ViT-S/8 @448) 58.9 vs 72.4 ms full-forward
(benchmarks/exp_flash_inmodel{,_long}.py, exp_flash_longseq.py). It is
the TPU default for the frozen backbone via attention_impl="auto"
(models/vit.py) for B*heads >= 48 and S >= 512; bf16-score XLA is the
fallback at small batch. Forward-only (the backbone is frozen).

Design (see the Pallas guide's flash-attention walkthrough):
  * grid = (batch*heads, S/block_q, S/block_k); the last axis is the
    sequential online-softmax reduction, the first two are parallel;
  * running max / sum / output accumulator in fp32 VMEM scratch that
    persists across the kv axis;
  * bf16 inputs are fine — QK^T and PV accumulate fp32 via
    preferred_element_type;
  * ragged sequence lengths are handled by static padding + iota
    masking (mask value -0.7*f32max, not -inf, to avoid exp NaNs);
  * forward-only: the backbone is frozen in this framework, so no
    custom VJP is required (XLA attention remains available via
    models/vit.py attention_impl="xla" for training paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    sm_scale: float,
    kv_len: int,
    block_k: int,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)
    if sm_scale != 1.0:
        s = s * sm_scale

    # Mask padded kv positions (static padding).
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
    s = jnp.where(col < kv_len, s, _MASK_VALUE)

    # m/l scratch are (block_q, LANES) with all columns equal (lane
    # replication keeps the layout tiling-friendly); compute with the
    # first column and store broadcast.
    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # (block_q, LANES)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])  # (block_q, block_k)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next

    v = v_ref[0]  # (block_k, d)
    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _store():
        l_final = l_scr[...][:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _default_blocks(S: int):
    """Padding-tight block choice. Padding waste dominated the kernel's
    cost at ViT shapes (S=1025 with 512/1024 blocks pads the score area
    3x and LOSES to XLA; a single 1152 tile pads 1.12x and WINS — see
    benchmarks/exp_flash_inmodel.py). Up to S=1536 use one lane-rounded
    tile (<= 9.4 MB fp32 scores in VMEM); beyond that, 1152 blocks keep
    the multiple-of-1152 padding under ~20% for the zoo's sequence
    lengths (2116 @644 ViT-B -> 2304, 3137 @448/8 -> 3456)."""
    padded = -(-S // 128) * 128
    if padded <= 1536:
        return padded, padded
    return 1152, 1152


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float = 1.0,
    block_q: int = 0,
    block_k: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q @ k^T * sm_scale) @ v, tiled.

    q, k, v: (B, H, S, D) with any S (padded internally); D <= 256.
    block_q/block_k of 0 pick the padding-tight defaults. Returns
    (B, H, S, D) in q.dtype.
    """
    B, H, S, D = q.shape
    orig_S = S
    dq, dk = _default_blocks(S)
    block_q = block_q or dq
    block_k = block_k or dk
    block_q = min(block_q, max(128, 1 << (S - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (S - 1).bit_length()))
    qp = _pad_to(q.reshape(B * H, S, D), 1, block_q)
    kp = _pad_to(k.reshape(B * H, S, D), 1, block_k)
    vp = _pad_to(v.reshape(B * H, S, D), 1, block_k)
    Sq, Sk = qp.shape[1], kp.shape[1]

    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, kv_len=orig_S, block_k=block_k
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
        grid=(B * H, Sq // block_q, Sk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :orig_S].reshape(B, H, orig_S, D)


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, sm_scale: float = 1.0) -> jnp.ndarray:
    """Reference einsum attention (XLA-fused); used for numerics tests
    and as the CPU / training-path fallback."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32).astype(q.dtype)


def xla_attention_bf16(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, sm_scale: float = 1.0) -> jnp.ndarray:
    """XLA attention with bfloat16 score storage.

    The (B, H, S, S) score matrix is the dominant HBM round trip of the
    ViT forward on TPU (fp32 scores at B16/S1025 are ~400 MB per layer
    per direction); keeping them bf16 halves that traffic. Numerics:
    the softmax max-subtraction and normalization still run in fp32;
    only the stored logits lose mantissa (~3 decimal digits), which is
    far below the traversability head's sensitivity — gated behind
    attention_impl="xla_bf16" with a tolerance test, fp32 stays the
    parity default."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.bfloat16)
    s = (s.astype(jnp.float32) * sm_scale)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(jnp.bfloat16)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return (out / l).astype(q.dtype)
