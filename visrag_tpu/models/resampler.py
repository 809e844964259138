"""Perceiver resampler: 64 learnable queries cross-attend to ViT patch tokens.

Parity with /root/reference/src/openmatch/modeling/modeling_minicpmv/resampler.py:
  * queries (64, 2304) + fixed 8×8 2-D sincos pos embed on the query side;
  * keys get an *adaptive* 2-D sincos pos embed for the slice's (h, w) patch
    grid (resampler.py:148-151) — computed on-device here from (h, w) scalars
    so slices with different grids batch in one program;
  * kv_proj 1152→2304 (no bias), ln_kv/ln_q/ln_post (eps 1e-6), torch
    nn.MultiheadAttention layout (joint in_proj, out_proj), final @ proj.

The attention itself is a 64-query cross-attention — tiny, so it runs as a
plain masked XLA softmax (no Pallas needed; MXU-bound matmuls either way).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Dense, LayerNorm, get_2d_sincos_pos_embed, sincos_2d_device


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    num_queries: int = 64      # grid_size 8 (sqrt(query_num))
    embed_dim: int = 2304      # LM hidden size
    kv_dim: int = 1152         # ViT width
    num_heads: int = 18        # embed_dim // 128
    ln_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    # MiniCPM-V 2.0 adds a fixed 8×8 sincos pos embed to the queries
    # (resampler.py:143-146); the 2.6 resampler drops it (only the adaptive
    # key-side pos remains) — set False for the 2.6 composite.
    query_pos: bool = True

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(num_queries=4, embed_dim=16, kv_dim=8, num_heads=2,
                        dtype=jnp.float32)
        defaults.update(kw)
        return cls(**defaults)


class Resampler(nn.Module):
    cfg: ResamplerConfig

    @nn.compact
    def __call__(self, x, grid_h, grid_w, mask):
        """x: (N, MAX_P, kv_dim) ViT features; grid_h/grid_w: (N,) int32 patch
        grids; mask: (N, MAX_P). Returns (N, num_queries, embed_dim)."""
        c = self.cfg
        n, max_p, _ = x.shape
        grid = int(round(c.num_queries ** 0.5))

        query = self.param("query", nn.initializers.truncated_normal(0.02),
                           (c.num_queries, c.embed_dim), jnp.float32)
        q_pos = None
        if c.query_pos:
            # fixed 8×8 sincos buffer (loaded from ckpt; non-trainable there)
            q_pos = self.param(
                "pos_embed",
                lambda key, shape: jnp.asarray(
                    get_2d_sincos_pos_embed(c.embed_dim, grid, grid)),
                (c.num_queries, c.embed_dim))
        in_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                          (3 * c.embed_dim, c.embed_dim), jnp.float32)
        in_b = self.param("in_proj_bias", nn.initializers.zeros,
                          (3 * c.embed_dim,), jnp.float32)
        proj = self.param("proj", nn.initializers.normal(c.embed_dim ** -0.5),
                          (c.embed_dim, c.embed_dim), jnp.float32)

        kv = x
        if c.kv_dim != c.embed_dim:
            kv = Dense(c.kv_dim, c.embed_dim, use_bias=False, dtype=c.dtype,
                       name="kv_proj")(x)
        kv = LayerNorm(c.embed_dim, c.ln_eps, c.dtype, name="ln_kv")(kv)

        # adaptive key pos embeds per slice (reference resampler.py:148-151)
        k_pos = jax.vmap(
            lambda h, w: sincos_2d_device(c.embed_dim, h, w, max_p)
        )(grid_h, grid_w)                                   # (N, MAX_P, E)

        q = LayerNorm(c.embed_dim, c.ln_eps, c.dtype, name="ln_q")(
            query.astype(c.dtype))
        if q_pos is not None:
            q = q + q_pos.astype(c.dtype)                   # (Q, E)
        k = kv + k_pos.astype(c.dtype)
        v = kv

        wq, wk, wv = jnp.split(in_w, 3, axis=0)
        bq, bk, bv = jnp.split(in_b, 3, axis=0)
        h, d = c.num_heads, c.embed_dim // c.num_heads
        qh = (jnp.einsum("qe,fe->qf", q, wq.astype(c.dtype)) +
              bq.astype(c.dtype)).reshape(c.num_queries, h, d)
        kh = (jnp.einsum("npe,fe->npf", k, wk.astype(c.dtype)) +
              bk.astype(c.dtype)).reshape(n, max_p, h, d)
        vh = (jnp.einsum("npe,fe->npf", v, wv.astype(c.dtype)) +
              bv.astype(c.dtype)).reshape(n, max_p, h, d)

        s = jnp.einsum("qhd,nphd->nhqp", qh.astype(jnp.float32),
                       kh.astype(jnp.float32)) / (d ** 0.5)
        s = jnp.where(mask[:, None, None, :] > 0, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("nhqp,nphd->nqhd", p, vh.astype(jnp.float32))
        o = o.reshape(n, c.num_queries, c.embed_dim).astype(c.dtype)
        o = Dense(c.embed_dim, c.embed_dim, use_bias=True, dtype=c.dtype,
                  name="out_proj")(o)

        o = LayerNorm(c.embed_dim, c.ln_eps, c.dtype, name="ln_post")(o)
        return jnp.einsum("nqe,ef->nqf", o, proj.astype(c.dtype))
