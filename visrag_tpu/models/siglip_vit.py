"""SigLIP-SO400M ViT vision tower, TPU-first.

Replaces the reference's timm `vit_so400m_patch14_siglip_384.webli` tower
(/root/reference/timm_modified/timm/models/vision_transformer.py:2611-2618,
used by modeling_minicpmv.py:57-73 with dynamic_img_size + dynamic_img_pad and
the last block dropped, attn_pool → Identity).

TPU-first redesign of "dynamic image size": instead of per-sample dynamic
shapes (a recompile per aspect ratio), every slice is pre-patchified on the
host to a static (MAX_PATCHES, 3*14*14) buffer with a validity mask, and the
bicubic-antialias position-embedding resample (timm pos_embed.py:17-57) is
expressed as a per-slice interpolation matrix P ∈ R^{MAX_PATCHES×729} so that
pos = P @ pos_embed — exact (the resample is linear in pos_embed),
differentiable, and batchable across arbitrary grids in ONE compiled program.

Arch: patch14, width 1152, depth 27 (26 used: drop_vision_last_layer), heads 16
(head_dim 72), mlp 4304, LayerNorm eps 1e-6, GELU, qkv bias, no class token.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import (flash_attention, flash_attention_hsd,
                             xla_lengths_attention)
from ..ops.gelu import fast_gelu
from .common import Dense, LayerNorm, QuantDense


@dataclasses.dataclass(frozen=True)
class SiglipViTConfig:
    patch_size: int = 14
    embed_dim: int = 1152
    depth: int = 26            # 27 - 1 (drop_vision_last_layer=True)
    num_heads: int = 16
    mlp_dim: int = 4304        # int(1152 * 3.7362)
    pos_grid: int = 27         # 384/14 native grid
    ln_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    # False: no remat (inference). True: remat whole blocks (min memory —
    # bwd recomputes attention too). "mlp": remat only the MLP sub-part;
    # attention activations/residuals stay saved (≈145 MB/block at the
    # encode shape) and the bwd skips the attention-forward recompute.
    remat: Any = False
    # "auto"/"flat": FLAT fused-qkv layout — the qkv GEMM emits
    # (N*P, 3*H*128) with the head-dim pad carried in the weights, the flash
    # kernel reads head panels straight out of it via block index maps, and
    # o feeds the projection GEMM as-is; zero relayouts around attention
    # (51.8 vs 54.6 ms/block against "packed" at the encode shape, chip
    # A/B). Differentiable (custom VJP unflattens for the stacked bwd
    # kernels). "packed": qkv einsum into the stacked (3, N, H, P, 128)
    # layout (XLA fuses the transpose into the matmul). "xla": batch-chunked
    # XLA-fused attention; "flash": per-call pad path.
    attn_impl: str = "auto"
    # padded lane width for the packed path
    head_pad: int = 128
    # "int8": w8a8 GEMMs for qkv/fc1/fc2 (2x MXU rate on v5e; measured
    # 300-363 TOP/s vs 150-192 TF/s). Inference-only, OFF by default —
    # the bit-parity path is bf16 like the reference. proj stays bf16
    # (its input is the attention output; the quant pass there costs more
    # than the GEMM saves at (m, 2048)x(2048, 1152)).
    quant: str = "none"
    # MLP activation: "erf" — timm so400m exact GELU (MiniCPM-V 2.0,
    # bf16-exact fast path); "tanh" — HF SigLIP gelu_pytorch_tanh
    # (MiniCPM-V 2.6's navit vpm).
    act: str = "erf"

    def __post_init__(self):
        # mirror MiniCPMConfig: int8 has no VJP — block training configs
        if self.quant != "none" and self.remat:
            raise ValueError(
                "quant='int8' is inference-only (no VJP); remat=True marks a "
                "training config — use quant='none' for training")

    @property
    def patch_dim(self) -> int:
        return 3 * self.patch_size * self.patch_size

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(embed_dim=32, depth=2, num_heads=2, mlp_dim=64,
                        pos_grid=4, patch_size=2, dtype=jnp.float32)
        defaults.update(kw)
        return cls(**defaults)


class PackedQKV(nn.Module):
    """Fused qkv projection emitting (3, N, H, P, DP) with the head dim
    zero-padded to DP lanes inside the weight. Param layout identical to
    Dense(e, 3e) (torch (out, in) `weight` + `bias`) for HF loading."""
    heads: int
    head_dim: int
    head_pad: int
    dtype: Any
    quant: bool = False

    @nn.compact
    def __call__(self, y):
        h, d, dp = self.heads, self.head_dim, self.head_pad
        n, p, e = y.shape
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (3 * e, e), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (3 * e,), jnp.float32)
        wp = weight.reshape(3, h, d, e)
        bp = bias.reshape(3, h, d)
        if dp != d:
            wp = jnp.pad(wp, ((0, 0), (0, 0), (0, dp - d), (0, 0)))
            bp = jnp.pad(bp, ((0, 0), (0, 0), (0, dp - d)))
        if self.quant:
            from ..ops.quant import int8_dense
            w2d = wp.transpose(3, 0, 1, 2).reshape(e, 3 * h * dp)
            flat = int8_dense(y.reshape(n * p, e), w2d, out_dtype=self.dtype)
            qkv = flat.reshape(n, p, 3, h, dp).transpose(2, 0, 3, 1, 4)
        else:
            qkv = jnp.einsum("npe,thde->tnhpd", y.astype(self.dtype),
                             wp.astype(self.dtype))
        qkv = qkv + bp.astype(self.dtype)[:, None, :, None, :]
        return qkv[0], qkv[1], qkv[2]


class PackedProj(nn.Module):
    """Output projection consuming (N, H, P, DP) directly; pad rows of the
    weight are zero so the pad lanes of `o` are ignored exactly."""
    heads: int
    head_dim: int
    head_pad: int
    dtype: Any

    @nn.compact
    def __call__(self, o):
        h, d, dp = self.heads, self.head_dim, self.head_pad
        e = h * d
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (e, e), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (e,), jnp.float32)
        wp = weight.reshape(e, h, d)
        if dp != d:
            wp = jnp.pad(wp, ((0, 0), (0, 0), (0, dp - d)))
        out = jnp.einsum("nhpd,ehd->npe", o, wp.astype(self.dtype))
        return out + bias.astype(self.dtype)


class FlatQKV(nn.Module):
    """Fused qkv projection emitting the FLAT (N*P, 3*H*DP) layout that
    ops.attention.flash_attention_flat consumes directly (head-dim pad
    carried in the weight, like PackedQKV; same param tree as Dense(e, 3e)).
    With quant=True the GEMM runs the int8 Pallas kernel — the flat output
    needs no transpose, which is what made the in-model int8 path lose to
    bf16 before (BASELINE.md round-3 notes)."""
    heads: int
    head_dim: int
    head_pad: int
    dtype: Any
    quant: bool = False

    @nn.compact
    def __call__(self, y):
        h, d, dp = self.heads, self.head_dim, self.head_pad
        n, p, e = y.shape
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (3 * e, e), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (3 * e,), jnp.float32)
        wp = weight.reshape(3, h, d, e)
        bp = bias.reshape(3, h, d)
        if dp != d:
            wp = jnp.pad(wp, ((0, 0), (0, 0), (0, dp - d), (0, 0)))
            bp = jnp.pad(bp, ((0, 0), (0, 0), (0, dp - d)))
        w2d = wp.transpose(3, 0, 1, 2).reshape(e, 3 * h * dp)
        b2d = bp.reshape(3 * h * dp)
        y2d = y.reshape(n * p, e)
        if self.quant:
            from ..ops.quant import int8_dense
            return int8_dense(y2d, w2d, bias=b2d, out_dtype=self.dtype)
        out = jnp.dot(y2d.astype(self.dtype), w2d.astype(self.dtype))
        return out + b2d.astype(self.dtype)


class FlatProj(nn.Module):
    """Output projection consuming the flat (N*P, H*DP) attention output;
    pad rows of the weight are zero so pad lanes are ignored exactly."""
    heads: int
    head_dim: int
    head_pad: int
    dtype: Any

    @nn.compact
    def __call__(self, o2d):
        h, d, dp = self.heads, self.head_dim, self.head_pad
        e = h * d
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (e, e), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (e,), jnp.float32)
        wp = weight.reshape(e, h, d)
        if dp != d:
            wp = jnp.pad(wp, ((0, 0), (0, 0), (0, dp - d)))
        w2d = wp.transpose(1, 2, 0).reshape(h * dp, e)
        out = jnp.dot(o2d, w2d.astype(self.dtype))
        return out + bias.astype(self.dtype)


class ViTBlock(nn.Module):
    cfg: SiglipViTConfig

    @nn.compact
    def __call__(self, x, lengths):
        c = self.cfg
        n, p, e = x.shape
        h, d = c.num_heads, c.embed_dim // c.num_heads
        y = LayerNorm(e, c.ln_eps, c.dtype, name="norm1")(x)
        if c.attn_impl in ("auto", "flat"):
            o = self._flat_attention(y, lengths, h, d)
        elif c.attn_impl == "packed":
            o = self._packed_attention(y, lengths, h, d)
        else:
            qkv = Dense(e, 3 * e, use_bias=True, dtype=c.dtype,
                        name="attn_qkv")(y)
            q, k, v = jnp.split(qkv.reshape(n, p, 3, h, d), 3, axis=2)
            q, k, v = (t[:, :, 0] for t in (q, k, v))
            if c.attn_impl == "xla":
                o = xla_lengths_attention(q, k, v, lengths, causal=False)
            else:
                o = flash_attention(q, k, v, lengths=lengths, causal=False)
            o = Dense(e, e, use_bias=True, dtype=c.dtype,
                      name="attn_proj")(o.reshape(n, p, e))
        x = x + o
        if c.remat == "mlp":
            # selective remat: only the MLP recomputes in bwd; attention
            # activations (incl. the flash kernel's o/lse residuals) stay
            # saved, so the bwd never re-runs the attention forward — the
            # expensive recompute under whole-block remat. Params keep their
            # names (_mlp_part creates norm2/mlp_fc1/mlp_fc2 in this scope).
            return x + nn.remat(ViTBlock._mlp_part)(self, x)
        return x + self._mlp_part(x)

    def _mlp_part(self, x):
        c = self.cfg
        e = c.embed_dim
        y = LayerNorm(e, c.ln_eps, c.dtype, name="norm2")(x)
        # int8 covers qkv + fc1 only: fc2's large-K kernel (202 TOP/s) plus
        # the gelu-output quant pass measured a wash vs the bf16 GEMM, so
        # bf16 keeps the accuracy for free; proj likewise stays bf16.
        C1 = QuantDense if c.quant == "int8" else Dense
        y = C1(e, c.mlp_dim, use_bias=True, dtype=c.dtype, name="mlp_fc1")(y)
        y = fast_gelu(y) if c.act == "erf" else jax.nn.gelu(y,
                                                            approximate=True)
        return Dense(c.mlp_dim, e, use_bias=True, dtype=c.dtype,
                     name="mlp_fc2")(y)

    def _flat_attention(self, y, lengths, h, d):
        """Transpose-free attention path: fused qkv GEMM → flat kernel →
        proj GEMM, all in the (N*P, …) layout (see FlatQKV). The int8 w8a8
        option plugs in here (qkv through the Pallas int8 GEMM)."""
        from ..ops.attention import flash_attention_flat
        c = self.cfg
        n, p, e = y.shape
        dp = max(c.head_pad, d) if c.head_pad else d
        qkv = FlatQKV(h, d, dp, c.dtype, quant=c.quant == "int8",
                      name="attn_qkv")(y)
        o2d = flash_attention_flat(qkv, lengths, n=n, seq=p, heads=h,
                                   head_dim=dp, sm_scale=1.0 / (d ** 0.5))
        return FlatProj(h, d, dp, c.dtype, name="attn_proj")(o2d).reshape(
            n, p, e)

    def _packed_attention(self, y, lengths, h, d):
        """qkv emitted directly in the flash kernel's (N, H, P, DP) layout
        with the head dim zero-padded to `head_pad` lanes inside the weights
        (param tree identical to the Dense path — the pad is applied at apply
        time, costs one tiny weight copy, and its gradient is identically
        zero: dq/dk pad lanes see zero k/q lanes, do pad lanes see zero proj
        rows — so training leaves the pad lanes at exactly zero)."""
        c = self.cfg
        dp = max(c.head_pad, d) if c.head_pad else d
        q, k, v = PackedQKV(h, d, dp, c.dtype, quant=c.quant == "int8",
                            name="attn_qkv")(y)
        o = flash_attention_hsd(q, k, v, lengths, causal=False,
                                sm_scale=1.0 / (d ** 0.5))
        return PackedProj(h, d, dp, c.dtype, name="attn_proj")(o)


class SiglipViT(nn.Module):
    """forward_features equivalent: patchified input → normed patch tokens.

    Args:
      patches:   (N, MAX_P, 3*ps*ps) pre-extracted patch pixels (normalized).
      mask:      (N, MAX_P) 1 for real patches, 0 for padding.
      pos_matrix:(N, MAX_P, pos_grid²) bicubic resample matrix; pos embedding
                 for slice n = pos_matrix[n] @ pos_embed.
    Returns (N, MAX_P, embed_dim); rows where mask==0 are garbage (mask them).
    """
    cfg: SiglipViTConfig

    @nn.compact
    def __call__(self, patches, mask, pos_matrix):
        c = self.cfg
        w = self.param("patch_embed_weight", nn.initializers.lecun_normal(),
                       (c.embed_dim, c.patch_dim), jnp.float32)
        b = self.param("patch_embed_bias", nn.initializers.zeros,
                       (c.embed_dim,), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (c.pos_grid * c.pos_grid, c.embed_dim), jnp.float32)
        x = jnp.einsum("npd,ed->npe", patches.astype(c.dtype),
                       w.astype(c.dtype)) + b.astype(c.dtype)
        pos_i = jnp.einsum("npg,ge->npe", pos_matrix.astype(jnp.float32),
                           pos).astype(c.dtype)
        x = x + pos_i
        lengths = jnp.sum(mask.astype(jnp.int32), axis=1)  # contiguous prefix
        block = ViTBlock
        if c.remat and c.remat != "mlp":
            # prevent_cse must stay True (default): with False, XLA CSE merges the
            # bwd recompute back into the fwd and every block's activations
            # stay live - measured 31.9 GB vs 11.9 GB on the retriever step.
            # (remat="mlp" remats inside the block instead — ViTBlock._mlp_part)
            block = nn.remat(ViTBlock)
        for i in range(c.depth):
            x = block(c, name=f"blocks_{i}")(x, lengths)
        x = LayerNorm(c.embed_dim, c.ln_eps, c.dtype, name="norm")(x)
        return x
