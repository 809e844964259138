"""int8 (w8a8) matmul path for the encode towers — v5e MXU runs s8xs8->s32
at 2x the bf16 rate (measured 300-363 TOP/s vs 150-192 TF/s on the ViT GEMM
shapes; see BASELINE.md). Inference-only, opt-in (SiglipViTConfig.quant):
the reference runs bf16, so the bit-parity path stays the default.

Scheme: symmetric per-row (token) dynamic activation scales x per-column
(output channel) weight scales — the standard w8a8 recipe; both factor out
of the GEMM contraction exactly:

    y[m, n] = (xq[m, :] . wq[:, n]) * xs[m] * ws[n]

Weights stay in fp32/bf16 params (checkpoints and HF loading unchanged);
quantization happens at apply time (the weight pass is tiny next to the
activation GEMMs, and XLA folds it into one fused pass per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quant_rowwise(x, axis: int = -1):
    """x (..., k) -> (int8 q, f32 scale (..., 1)). Symmetric absmax."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quant_weight_colwise(w):
    """w (k, n) -> (int8 (k, n), f32 (n,)) per-output-channel symmetric."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(xq, xs, wq, ws, out_dtype=jnp.bfloat16):
    """(m, k) s8 @ (k, n) s8 -> out_dtype with the scales applied in the
    s32 epilogue (XLA fuses the convert+scale into the matmul output)."""
    acc = jax.lax.dot_general(xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * ws[None, :]).astype(out_dtype)


def int8_dense(x, w, bias=None, out_dtype=jnp.bfloat16):
    """Drop-in dense: dynamic per-row activation quant, per-column weight
    quant, s8 GEMM. x (..., k), w (k, n) fp — bias added in fp32.

    On TPU the GEMM runs through the Pallas kernel (matmul_int8.py) with the
    dequant fused in the epilogue — XLA-in-model reliably FAILS to fuse the
    s32 epilogue (HLO shows a lone s32 convolution + separate dequant fusion;
    every int8 block variant measured SLOWER than bf16 that way)."""
    lead = x.shape[:-1]
    xq, xs = quant_rowwise(x.reshape(-1, x.shape[-1]))
    wq, ws = quant_weight_colwise(w)
    if jax.default_backend() == "tpu":
        from .matmul_int8 import int8_matmul_fused, pick_gemm_blocks
        m, k = xq.shape
        bm, bn, bk = pick_gemm_blocks(m, k, w.shape[-1])
        y = int8_matmul_fused(xq, xs[:, 0], wq, ws, bias,
                              out_dtype=out_dtype, bm=bm, bn=bn, bk=bk)
        return y.reshape(*lead, w.shape[-1])
    # XLA fallback (CPU test mesh): s32 accumulation, exact
    y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * ws[None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, :]
    return y.astype(out_dtype).reshape(*lead, w.shape[-1])
