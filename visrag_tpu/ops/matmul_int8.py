"""Pallas int8 (w8a8) GEMM with fused dequant epilogue, for v5e's 2x-rate
s8 MXU mode.

Why a kernel: XLA runs the standalone s8 GEMM at ~390 TOP/s but IN-MODEL it
materializes the s32[M, N] product (HLO shows a lone convolution + separate
dequant fusion) and relays s8 operands through kLoop copies — every int8
block variant measured SLOWER than bf16 in the ViT (+2-4 ms/block) despite
standalone wins. The kernel keeps the s32 accumulator in VMEM and writes the
scaled bf16 output once:

    out[m, n] = (sum_k xq[m, k] * wq[k, n]) * xs[m] * ws[n] + bias[n]

Grid (M/bm, N/bn, K/bk) with the k axis arbitrary (acc scratch carried
across k steps, Mosaic double-buffers the operand DMAs). xs rides in a
(M, 128) lane-broadcast buffer (same trick as the attention kernels); ws and
bias ride (8, N) sublane-broadcasts.

Inference-only: no VJP (round() has zero gradient anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LANES = 128
NUM_SUBLANES = 8


def _kernel(xq_ref, wq_ref, xs_ref, ws_ref, bias_ref, o_ref, acc_ref):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(kb == nk - 1)
    def _epilogue():
        xs = xs_ref[:, 0:1]                     # (bm, 1) f32
        ws = ws_ref[0:1, :]                     # (1, bn) f32
        y = acc_ref[...].astype(jnp.float32) * xs * ws
        y = y + bias_ref[0:1, :]
        o_ref[...] = y.astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, pad)
    return jnp.pad(x, pads)


def _round_up(x, m):
    return (x + m - 1) // m * m


def pick_gemm_blocks(m: int, k: int, n: int):
    """(bm, bn, bk) for int8_matmul_fused. Measured on v5e (69632-row ViT
    GEMMs): (768, 1536, full-k) hits 252 TOP/s at k=1152; large-k shapes
    (fc2 4304) want small bm with full k (202 TOP/s at (256, 1152, 4352)).
    VMEM estimate (double-buffered s8 operands + s32 acc + bf16 out) kept
    under ~14 MB — (768, 3072, 1152) and (1024, 2176, 1152) OOM'd."""
    k_p = _round_up(k, 128)
    if k_p > 2304:
        # largest 128-multiple divisor of k_p that is <= 4352
        bk = 128
        for d in range(128, min(k_p, 4352) + 1, 128):
            if k_p % d == 0:
                bk = d
    else:
        bk = k_p
    bn = min(1536, _round_up(n, 128))
    bm = 768 if k_p <= 1280 else (256 if k_p > 2304 else 512)
    while bm > 256 and (2 * bm * bk + 2 * bk * bn + 6 * bm * bn) > 14e6:
        bm //= 2
    return max(bm, 256), bn, bk


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk",
                                             "interpret"))
def int8_matmul_fused(xq, xs, wq, ws, bias=None, *, out_dtype=jnp.bfloat16,
                      bm: int = 512, bn: int = 1536, bk: int = 2304,
                      interpret: bool = False):
    """(M, K) s8 @ (K, N) s8 -> (M, N) out_dtype with per-row (xs, (M,) or
    (M, 1) f32) and per-col (ws, (N,) f32) scales + optional bias fused.
    M/K/N are padded to block multiples internally (zeros are exact)."""
    m, k = xq.shape
    n = wq.shape[1]
    xs = xs.reshape(m)
    bias = jnp.zeros((n,), jnp.float32) if bias is None else bias
    # Clamp blocks to the problem size, then round UP to Mosaic's (8, 128)
    # sublane/lane tiling — min() alone can produce misaligned blocks for
    # m % 8 != 0 or n/k % 128 != 0, which interpret mode (CPU tests) accepts
    # but real lowering rejects. _pad_to below pads operands to the rounded
    # blocks, so the extra rows/cols are exact zeros.
    bm_ = _round_up(min(bm, m), NUM_SUBLANES)
    bn_ = _round_up(min(bn, n), NUM_LANES)
    bk_ = _round_up(min(bk, k), NUM_LANES)

    xq_p = _pad_to(_pad_to(xq, 0, bm_), 1, bk_)
    wq_p = _pad_to(_pad_to(wq, 0, bk_), 1, bn_)
    mp, kp = xq_p.shape
    np_ = wq_p.shape[1]
    xs_b = jnp.broadcast_to(_pad_to(xs, 0, bm_)[:, None], (mp, NUM_LANES))
    ws_b = jnp.broadcast_to(_pad_to(ws.astype(jnp.float32), 0, bn_)[None, :],
                            (NUM_SUBLANES, np_))
    bias_b = jnp.broadcast_to(
        _pad_to(bias.astype(jnp.float32), 0, bn_)[None, :],
        (NUM_SUBLANES, np_))

    grid = (mp // bm_, np_ // bn_, kp // bk_)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_, bk_), lambda i, j, kb: (i, kb)),
            pl.BlockSpec((bk_, bn_), lambda i, j, kb: (kb, j)),
            pl.BlockSpec((bm_, NUM_LANES), lambda i, j, kb: (i, 0)),
            pl.BlockSpec((NUM_SUBLANES, bn_), lambda i, j, kb: (0, j)),
            pl.BlockSpec((NUM_SUBLANES, bn_), lambda i, j, kb: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm_, bn_), lambda i, j, kb: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm_, bn_), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(xq_p, wq_p, xs_b, ws_b, bias_b)
    return out[:m, :n]
