"""Shared model building blocks (flax.linen)."""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class RMSNorm(nn.Module):
    """RMSNorm with fp32 accumulation (reference modeling_minicpm.py:126-140).
    Fused Pallas kernel on TPU (ops/norms.py)."""
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    use_pallas: bool = False  # measured: XLA's fusion is already at par

    @nn.compact
    def __call__(self, x):
        from ..ops.norms import _rmsnorm_xla, rmsnorm
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        fn = rmsnorm if self.use_pallas else _rmsnorm_xla
        return fn(x, weight, self.eps).astype(self.dtype)


class LayerNorm(nn.Module):
    """Standard LayerNorm (eps 1e-6 to match torch nn.LayerNorm defaults used by
    the resampler/ViT), fp32 math. Fused Pallas kernel on TPU (ops/norms.py)."""
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.norms import _layernorm_xla, layernorm
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        fn = layernorm if self.use_pallas else _layernorm_xla
        return fn(x, weight, bias, self.eps).astype(self.dtype)


class Dense(nn.Module):
    """Linear layer with torch-compatible (out, in) kernel naming for direct
    HF-safetensors loading. Stored as `weight` (out, in) and optional `bias`."""
    features_in: int
    features_out: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (self.features_out, self.features_in), self.param_dtype)
        y = jnp.einsum("...i,oi->...o", x.astype(self.dtype),
                       weight.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features_out,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class QuantDense(nn.Module):
    """Dense with the GEMM in int8 (w8a8) — same param tree as Dense
    (torch-layout `weight` (out, in) + `bias`), quantization at apply time
    (ops/quant.py). Inference-only: round() has zero gradient."""
    features_in: int
    features_out: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import int8_dense
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (self.features_out, self.features_in),
                            self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features_out,), self.param_dtype)
                if self.use_bias else None)
        return int8_dense(x, weight.T, bias, out_dtype=self.dtype)


def rope_frequencies(head_dim: int, theta: float = 10000.0,
                     scaling: Optional[dict] = None,
                     max_positions: int = 4096,
                     seq_len: Optional[int] = None) -> np.ndarray:
    """inv_freq per the reference RoPE (modeling_minicpm.py:142-291).

    scaling: None or {"type": "linear"|"dynamic", "factor": f} (HF
    config.rope_scaling). linear divides POSITIONS by factor (handled in
    apply_rope, reference :199-212); dynamic NTK rescales theta here when
    the sequence exceeds max_positions (reference :228-240). seq_len is the
    STATIC trace-time sequence length — exact for training where S is the
    real length; paths with per-row live lengths (engine prefill, decode)
    use dynamic_ntk_inv_freq instead."""
    if scaling:
        kind = scaling.get("type")
        if kind == "dynamic" and seq_len and seq_len > max_positions:
            factor = float(scaling["factor"])
            theta = theta * ((factor * seq_len / max_positions)
                             - (factor - 1.0)) ** (head_dim / (head_dim - 2))
        elif kind not in ("linear", "dynamic"):
            raise ValueError(f"unsupported rope_scaling type {kind!r} "
                             "(expected linear|dynamic)")
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    return inv_freq.astype(np.float32)


def dynamic_ntk_inv_freq(head_dim: int, theta: float, factor: float,
                         max_positions: int, seq_lens) -> jnp.ndarray:
    """Per-row NTK inv_freq from TRACED kv lengths (B,) → (B, D/2).

    HF's DynamicNTKScalingRotaryEmbedding recomputes theta from the live
    kv_seq_len on every forward (reference modeling_minicpm.py:228-240);
    already-cached K keep the rotation they were written with (an HF
    property this preserves). Rows at or under max_positions keep the
    base theta."""
    s = seq_lens.astype(jnp.float32)
    scaled = theta * ((factor * s / max_positions) - (factor - 1.0)) \
        ** (head_dim / (head_dim - 2))
    t = jnp.where(s > max_positions, scaled, theta)            # (B,)
    exp = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (t[:, None] ** exp[None, :])


def apply_rope(q, k, positions, inv_freq, scaling: Optional[dict] = None):
    """q,k: (B, S, H, D); positions: (B, S) int32; inv_freq: (D/2,) shared
    or (B, D/2) per-row (dynamic NTK). fp32 rotation, cast back
    (reference applies in fp32: modeling_minicpm.py:280-291)."""
    pos = positions.astype(jnp.float32)
    if scaling and scaling.get("type") == "linear":
        pos = pos / float(scaling["factor"])
    if inv_freq.ndim == 2:
        freqs = pos[..., None] * inv_freq[:, None, :]          # (B, S, D/2)
    else:
        freqs = pos[..., None] * inv_freq[None, None, :]       # (B, S, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)             # (B, S, D)
    cos = jnp.cos(emb)[:, :, None, :]
    sin = jnp.sin(emb)[:, :, None, :]

    def rot(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + rot(qf) * sin
    k_out = kf * cos + rot(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def get_2d_sincos_pos_embed(embed_dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    """2-D sin-cos position embedding, MAE convention (reference
    resampler.py:38-92): half the channels encode the row index, half the
    column; within each half, first sin then cos."""
    def one_dim(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid_h, dtype=np.float32)
    gw = np.arange(grid_w, dtype=np.float32)
    grid = np.meshgrid(gw, gh)  # w first (reference convention)
    grid = np.stack(grid, axis=0).reshape(2, -1)
    emb_h = one_dim(embed_dim // 2, grid[0])  # grid[0] = w-coords (sic, matches ref)
    emb_w = one_dim(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def sincos_2d_device(embed_dim: int, h, w, max_len: int):
    """On-device 2-D sincos for dynamic (h, w) grids, row-major over a padded
    length. h/w are traced scalars; output (max_len, embed_dim), rows past h*w
    are garbage and must be masked by the caller.

    Matches get_2d_sincos_pos_embed: first half encodes the *w* coordinate
    stream from the meshgrid (see reference resampler.py:47-56 where grid[0]
    is the w-ordinates), second half the h coordinate.
    """
    idx = jnp.arange(max_len)
    row = (idx // w).astype(jnp.float32)
    col = (idx % w).astype(jnp.float32)
    half = embed_dim // 2

    def one_dim(dim, pos):
        omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = pos[:, None] * omega[None, :]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)

    emb_w = one_dim(half, col)
    emb_h = one_dim(half, row)
    return jnp.concatenate([emb_w, emb_h], axis=1)
