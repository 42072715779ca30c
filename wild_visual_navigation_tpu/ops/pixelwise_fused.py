"""Fully-fused per-pixel traversability scoring — a Pallas TPU kernel.

The Gram scorer (ops/pixelwise.py, method="gram") already keeps every
D-channel tensor at patch resolution, but its pixel-resolution
intermediates still round-trip HBM between XLA ops: the K1=256-channel
hidden map (relu(upsample(Dense_0 feat))) alone is ~103 MB/frame at
448 px bf16, written once and read once, plus ~6 more (N, K) fp32
intermediates of ~26 MB each — ~390 MB/frame of HBM traffic for
~10 GFLOP of math (measured: the whole scorer costs ~1.0 ms/img on
v5e-1 where its FLOPs are worth ~0.15 ms).

This kernel fuses everything after the patch-resolution precomputes so
NO pixel-resolution tensor except the two (H, W) output maps ever
exists in HBM:

  XLA precompute (all patch-H resolution, ~5 MB/frame total, stored
  channels-in-sublanes / pixels-in-lanes, W padded to a multiple of
  the 128-lane width):
    hw   = upsample_W(Dense_0 feat)^T         (B, Hp, K1, Wpad) bf16
    zsts = [upsample_W(Wr feat) ;             (B, Hp, K+3, Wpad) fp32
            upsample_W(br·feat) ;
            W-contracted Gram maps t0/t1 of ||x_up||² (see
            ops/resize.py::interpolate_norm_sq_mxu)]

  Pallas kernel, grid (B, W/128), fori_loop over row-chunks of C=8
  output rows; per chunk:
    2-tap H-axis lerp of hw/zsts rows (VPU; per-row index + weight
    tables in SMEM), pieces concatenated on the lane axis at
    128-aligned offsets -> relu -> W1ᵀ· and Gᵀ· matmuls (MXU, pixels
    in lanes) -> reconstruction MSE via the expanded Gram form
    (sublane reduction) -> sigmoid/max -> ONE (1, C·128) lane-dense
    row write per map.

  Everything stays lane-aligned: Mosaic's layout inference rejects
  sublane<->lane shape casts, so per-pixel scalars are born and
  written as lane vectors and the (row-chunk, col-block) -> (H, W)
  unscramble is one cheap XLA reshape/transpose outside.

Same math as method="gram" (which is itself equivalence-tested against
the literal reference order, dino_interface.py:87-91 +
quick_start.py:184-194); fp summation order differs (W-axis before
H-axis, fp32 mid rows instead of bf16) — tolerance-tested in
tests/test_models.py against the reference order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resize import _bilinear_matrix_np, _bilinear_pair_matrices_np

_HIGH = jax.lax.Precision.HIGHEST
_LANES = 128  # TPU vreg lane width; column blocks are one vreg wide
_C = 8  # output rows per matmul chunk (C*_LANES = 1024 matmul lanes)


def _row_tables(out_size: int, in_size: int):
    """Per-output-row tables for the 2-tap H-axis combine.

    Returns (starts, coef) with starts[y] = the first of the two input
    rows the kernel slices (clamped so start+1 is always in range) and
    coef[y] = [c0, c1, q0, q1, x0, 0, 0, 0]:
      value   = c0*row[start] + c1*row[start+1]         (lerp weights)
      normsq  = q0*t0[start] + q1*t0[start+1]
              + x0*t1[start]                            (pair weights)
    The cross term needs only t1[start]: Mx[y, j] = M[y,j]*M[y,j+1] is
    nonzero only where BOTH j and j+1 are taps, i.e. j = start — a
    hypothetical x1·t1[start+1] slot would multiply M[y,start+1]*
    M[y,start+2] = 0 always. Merged-tap boundary rows (both taps on the
    last input row) collapse correctly because the weights come from
    the same `_bilinear_matrix` machinery the XLA paths use (pure-numpy
    form — jnp constants become tracers mid-trace).
    """
    M = _bilinear_matrix_np(out_size, in_size)
    Aq, Ax = _bilinear_pair_matrices_np(out_size, in_size)
    Axp = np.zeros((out_size, in_size), np.float32)
    Axp[:, : max(in_size - 1, 0)] = Ax
    # tap positions come from M itself (first nonzero column per row,
    # clamped so start+1 stays in range), NOT a re-derivation of the
    # interpolation rule — if resize.py ever changes its tap/clamping
    # convention, these tables follow automatically
    starts = np.minimum(np.argmax(M > 0, axis=1), in_size - 2).astype(np.int32)
    rows = np.arange(out_size)
    coef = np.zeros((out_size, 8), np.float32)
    coef[:, 0] = M[rows, starts]
    coef[:, 1] = M[rows, starts + 1]
    coef[:, 2] = Aq[rows, starts]
    coef[:, 3] = Aq[rows, starts + 1]
    coef[:, 4] = Axp[rows, starts]
    return starts, coef


def supports_fused(mlp_params, feat_shape, out_h: int, out_w: int) -> bool:
    """Static qualification for the Pallas kernel: >=2 patch rows/cols
    per axis (2-tap slices), the SimpleMLP Dense_i stack with exactly
    one mid layer, and operand blocks that fit the 16 MB scoped-VMEM
    budget double-buffered. Any out_h >= 2 works: the row count is
    padded to the 8-row chunk with clamped duplicate rows, trimmed
    outside the kernel."""
    p = mlp_params.get("params", {})
    names = sorted((k for k in p if k.startswith("Dense_")), key=lambda k: int(k.split("_")[1]))
    if len(names) != 3:
        return False
    B, D, Hp, Wp = feat_shape
    if Hp < 2 or Wp < 2 or out_w < 2 or out_h < 2:
        return False
    K1 = p[names[0]]["kernel"].shape[1]
    K = p[names[1]]["kernel"].shape[1]
    kp = (K + 3 + 7) // 8 * 8  # zsts sublanes, padded to the f32 tile
    in_bytes = Hp * _LANES * (K1 * 2 + kp * 4)
    out_h_pad = -(-out_h // _C) * _C
    out_bytes = 2 * out_h_pad * _LANES * 4  # two fp32 output blocks
    # double-buffered operands within a 12 MB slice of the 16 MB of
    # scoped VMEM (headroom for the weight blocks + compiler scratch)
    return (in_bytes + out_bytes) * 2 <= 12_000_000


def fused_precompute(mlp_params, feat: jnp.ndarray, out_h: int, out_w: int):
    """The XLA stage of the fused scorer: every patch-H-resolution
    operand the Pallas kernel consumes (split out so
    benchmarks/exp_px_decompose.py can time precompute vs kernel).

    Returns (operands tuple, (K1, K, ny, nx, out_h_pad, Wpad))."""
    B, D, Hp, Wp = feat.shape
    p = mlp_params["params"]
    names = sorted((k for k in p if k.startswith("Dense_")), key=lambda k: int(k.split("_")[1]))
    (W0, b0) = p[names[0]]["kernel"], p[names[0]]["bias"]
    (W1, b1) = p[names[1]]["kernel"], p[names[1]]["bias"]
    (Wl, bl) = p[names[2]]["kernel"], p[names[2]]["bias"]
    K1, K = W0.shape[1], W1.shape[1]

    nx = -(-out_w // _LANES)
    Wpad = nx * _LANES
    ny = -(-out_h // _C)
    out_h_pad = ny * _C  # ragged tail rows clamp to the last output row

    # W-axis upsample matrix + its pair-product forms
    # (resize._bilinear_pair_matrices_np — one audited place for the
    # squared-norm expansion), zero-padded to Wpad output rows so the
    # lane-tail columns (x >= out_w) hold zeros, not garbage.
    Mw_np = np.zeros((Wpad, Wp), np.float32)
    Mw_np[:out_w] = _bilinear_matrix_np(out_w, Wp)
    Mw = jnp.asarray(Mw_np)
    Mqv, Mxv = _bilinear_pair_matrices_np(out_w, Wp)
    Mq_np = np.zeros((Wpad, Wp), np.float32)
    Mq_np[:out_w] = Mqv
    Mx_np = np.zeros((Wpad, Wp), np.float32)
    Mx_np[:out_w, : max(Wp - 1, 0)] = Mxv
    Mq, Mx = jnp.asarray(Mq_np), jnp.asarray(Mx_np)

    # ---- XLA precomputes, all at patch-H resolution, transposed to
    # channels-in-sublanes / pixels-in-lanes ----
    fb = feat.astype(jnp.bfloat16)
    f32 = feat.astype(jnp.float32)
    hp = jnp.einsum("bdhw,dk->bhwk", fb, W0.astype(jnp.bfloat16)) + b0.astype(jnp.bfloat16)
    hw = jnp.einsum("xj,bhjk->bhkx", Mw.astype(jnp.bfloat16), hp)  # (B, Hp, K1, Wpad)

    Wl32, bl32 = Wl.astype(jnp.float32), bl.astype(jnp.float32)
    Wr, br = Wl32[:, 1:], bl32[1:]  # (K, D), (D,)
    zp = jnp.einsum("bdhw,kd->bhwk", f32, Wr, precision=_HIGH)
    zw = jnp.einsum("xj,bhjk->bhkx", Mw, zp, precision=_HIGH)  # (B, Hp, K, Wpad)
    sp = jnp.einsum("bdhw,d->bhw", f32, br)
    sw = jnp.einsum("xj,bhj->bhx", Mw, sp, precision=_HIGH)  # (B, Hp, Wpad)

    # W-contracted Gram maps of ||upsample(feat)||^2 (interpolate_norm_sq_mxu)
    g00 = jnp.einsum("bdhw,bdhw->bhw", f32, f32)
    g01 = jnp.einsum("bdhw,bdhw->bhw", f32[..., :-1], f32[..., 1:])
    g10 = jnp.einsum("bdhw,bdhw->bhw", f32[:, :, :-1], f32[:, :, 1:])
    g11 = jnp.einsum("bdhw,bdhw->bhw", f32[:, :, :-1, :-1], f32[:, :, 1:, 1:])
    g1m1 = jnp.einsum("bdhw,bdhw->bhw", f32[:, :, 1:, :-1], f32[:, :, :-1, 1:])
    t0 = jnp.einsum("xj,bhj->bhx", Mq, g00, precision=_HIGH)
    t0 = t0 + 2.0 * jnp.einsum("xj,bhj->bhx", Mx[:, : Wp - 1], g01, precision=_HIGH)
    t1 = 2.0 * (
        jnp.einsum("xj,bhj->bhx", Mq, g10, precision=_HIGH)
        + jnp.einsum("xj,bhj->bhx", Mx[:, : Wp - 1], g11 + g1m1, precision=_HIGH)
    )
    t1 = jnp.pad(t1, ((0, 0), (0, 1), (0, 0)))  # Hp-1 -> Hp rows
    # Pack the K z-channels and the 3 scalar maps into ONE f32 operand
    # along the channel (sublane) axis — one block instead of two.
    zsts = jnp.concatenate(
        [zw, sw[:, :, None], t0[:, :, None], t1[:, :, None]], axis=2
    )  # (B, Hp, K+3, Wpad)

    # per-row H-axis tables, padded to the row-chunk by repeating the
    # last row's entries (the duplicate rows are trimmed below)
    starts_np, coef_np = _row_tables(out_h, Hp)
    if out_h_pad != out_h:
        pad = out_h_pad - out_h
        starts_np = np.concatenate([starts_np, np.repeat(starts_np[-1:], pad)])
        coef_np = np.concatenate([coef_np, np.repeat(coef_np[-1:], pad, axis=0)])
    starts = jnp.asarray(starts_np).reshape(1, out_h_pad)
    coef = jnp.asarray(coef_np)  # (out_h_pad, 8)

    M = jnp.einsum("kd,ld->kl", Wr, Wr, precision=_HIGH)  # (K, K)
    GT = jnp.concatenate([Wl32[:, :1], M], axis=1).T  # (1+K, K)
    v = (Wr @ br).reshape(K, 1)
    consts = jnp.asarray([[bl32[0], br @ br]], jnp.float32)
    W1T = W1.astype(jnp.bfloat16).T  # (K, K1)
    b1c = b1.astype(jnp.float32).reshape(K, 1)

    return (starts, coef, hw, zsts, W1T, b1c, GT, v, consts), (K1, K, ny, nx, out_h_pad, Wpad)


def pixelwise_score_fused(
    mlp_params,
    feat: jnp.ndarray,
    out_h: int,
    out_w: int,
    interpret: bool | None = None,
):
    """feat (B, D, Hp, Wp) -> (trav, reco), each (B, out_h, out_w) fp32.

    reco is the per-pixel reconstruction MSE (before confidence
    calibration — apply confidence_inference outside; it is elementwise
    and fuses in XLA). Caller must check supports_fused() first.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, D, Hp, Wp = feat.shape
    operands, (K1, K, ny, nx, out_h_pad, Wpad) = fused_precompute(mlp_params, feat, out_h, out_w)
    starts, coef, hw, zsts, W1T, b1c, GT, v, consts = operands

    kernel = partial(_score_kernel, C=_C, Xw=_LANES, K1=K1, K=K, D=D, ny=ny)
    grid = (B, nx)
    trav, reco = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, out_h_pad), lambda b, x: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((out_h_pad, 8), lambda b, x: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hp, K1, _LANES), lambda b, x: (b, 0, 0, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, K + 3, _LANES), lambda b, x: (b, 0, 0, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K1), lambda b, x: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda b, x: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1 + K, K), lambda b, x: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda b, x: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda b, x: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, out_h_pad, _LANES), lambda b, x: (b, 0, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_h_pad, _LANES), lambda b, x: (b, 0, x), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, out_h_pad, Wpad), jnp.float32),
            jax.ShapeDtypeStruct((B, out_h_pad, Wpad), jnp.float32),
        ],
        interpret=interpret,
    )(starts, coef, hw, zsts, W1T, b1c, GT, v, consts)
    # rows were written straight to their (B, out_h, Wpad) positions —
    # only the lane-pad tail to trim, no transpose.
    return trav[:, :out_h, :out_w], reco[:, :out_h, :out_w]


def _score_kernel(
    starts_ref,
    coef_ref,
    hw_ref,
    zsts_ref,
    W1T_ref,
    b1_ref,
    GT_ref,
    v_ref,
    consts_ref,
    trav_ref,
    reco_ref,
    *,
    C: int,
    Xw: int,
    K1: int,
    K: int,
    D: int,
    ny: int,
):
    # Pixels live in LANES (columns of this 128-wide W block + the C
    # rows of the chunk concatenated at 128-aligned lane offsets);
    # channels live in SUBLANES. Per-pixel scalars are therefore born
    # as (1, C*Xw) lane vectors — no sublane<->lane shape casts, which
    # Mosaic's layout inference rejects.
    b2 = consts_ref[0, 0]
    cc = consts_ref[0, 1]
    W1T = W1T_ref[:]  # (K, K1) bf16
    b1c = b1_ref[:]  # (K, 1) f32
    GT = GT_ref[:]  # (1+K, K) f32
    vc = v_ref[:]  # (K, 1) f32

    def body(y, carry):
        hs, zs, ss, ns = [], [], [], []
        for i in range(C):
            r = y * C + i
            st = starts_ref[0, r]
            c0 = coef_ref[r, 0]
            c1 = coef_ref[r, 1]
            q0 = coef_ref[r, 2]
            q1 = coef_ref[r, 3]
            x0 = coef_ref[r, 4]
            hp2 = hw_ref[0, pl.ds(st, 2)]  # (2, K1, Xw) bf16
            hs.append(c0.astype(jnp.bfloat16) * hp2[0] + c1.astype(jnp.bfloat16) * hp2[1])
            zs2 = zsts_ref[0, pl.ds(st, 2)]  # (2, K+3, Xw) f32
            zs.append(c0 * zs2[0, :K] + c1 * zs2[1, :K])
            ss.append(c0 * zs2[0, K : K + 1] + c1 * zs2[1, K : K + 1])  # (1, Xw)
            ns.append(
                q0 * zs2[0, K + 1 : K + 2]
                + q1 * zs2[1, K + 1 : K + 2]
                + x0 * zs2[0, K + 2 : K + 3]
            )  # (1, Xw)
        h = jnp.maximum(jnp.concatenate(hs, axis=1), 0)  # (K1, C*Xw) bf16
        x1h = jax.lax.dot_general(
            W1T, h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        x1h = jnp.maximum(x1h + b1c, 0.0)  # (K, C*Xw) f32
        P = jax.lax.dot_general(
            GT, x1h, (((1,), (0,)), ((), ())),
            precision=_HIGH, preferred_element_type=jnp.float32,
        )  # (1+K, C*Xw)
        z = jnp.concatenate(zs, axis=1)  # (K, C*Xw)
        lin = P[1:] + 2.0 * (vc - z)
        reco = (
            jnp.sum(x1h * lin, axis=0, keepdims=True)
            + cc
            - 2.0 * jnp.concatenate(ss, axis=1)
            + jnp.concatenate(ns, axis=1)
        ) / D  # (1, C*Xw)
        trav = jax.nn.sigmoid(P[0:1] + b2)  # (1, C*Xw)
        reco = jnp.maximum(reco, 0.0)
        # per-row writes to the natural (out_h, Xw) layout; the lane
        # slices are 128-aligned so no relayout is needed, and the
        # consumer-side unscramble transpose (~0.6 ms/img!) disappears
        for i in range(C):
            trav_ref[0, pl.ds(y * C + i, 1), :] = trav[:, i * Xw : (i + 1) * Xw]
            reco_ref[0, pl.ds(y * C + i, 1), :] = reco[:, i * Xw : (i + 1) * Xw]
        return carry

    jax.lax.fori_loop(0, ny, body, 0)
