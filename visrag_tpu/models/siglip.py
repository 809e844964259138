"""Full SigLIP bi-tower model — the SigLIP-only retriever baseline.

Parity with the reference's vendored SigLIP
(/root/reference/src/openmatch/modeling/modeling_siglip/modeling_siglip.py):
text tower pooled = last token + linear head (:1014-1015 → HF :615-616),
vision tower + MultiheadAttentionPoolingHead learnable-probe pooling
(:1177-1200 → HF :689-735), gelu_pytorch_tanh activations, pre-LN encoder.
Selected by DRModel.build when the config name contains "siglip"
(dense_retrieval_model.py:258-262) with pooling mode `siglip_pooling`.

This is BASELINE.json configs[0]: SigLIP page embedding + cosine top-k.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from .common import Dense, LayerNorm


@dataclasses.dataclass(frozen=True)
class SiglipTowerConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


@dataclasses.dataclass(frozen=True)
class SiglipConfig:
    text: SiglipTowerConfig = SiglipTowerConfig()
    vision: SiglipTowerConfig = SiglipTowerConfig()
    vocab_size: int = 250000
    max_position_embeddings: int = 64
    projection_size: int = 1152
    image_size: int = 384
    patch_size: int = 14

    @classmethod
    def tiny(cls, **kw):
        tower = SiglipTowerConfig(hidden_size=32, intermediate_size=64,
                                  num_hidden_layers=2, num_attention_heads=2,
                                  dtype=jnp.float32)
        d = dict(text=tower, vision=tower, vocab_size=128,
                 max_position_embeddings=16, projection_size=32,
                 image_size=16, patch_size=4)
        d.update(kw)
        return cls(**d)


class SiglipEncoderLayer(nn.Module):
    cfg: SiglipTowerConfig

    @nn.compact
    def __call__(self, x, lengths=None):
        c = self.cfg
        b, s, e = x.shape
        h, d = c.num_attention_heads, c.head_dim
        y = LayerNorm(e, c.layer_norm_eps, c.dtype, name="layer_norm1")(x)
        q = Dense(e, e, dtype=c.dtype, name="q_proj")(y).reshape(b, s, h, d)
        k = Dense(e, e, dtype=c.dtype, name="k_proj")(y).reshape(b, s, h, d)
        v = Dense(e, e, dtype=c.dtype, name="v_proj")(y).reshape(b, s, h, d)
        o = flash_attention(q, k, v, lengths=lengths, causal=False)
        x = x + Dense(e, e, dtype=c.dtype, name="out_proj")(o.reshape(b, s, e))
        y = LayerNorm(e, c.layer_norm_eps, c.dtype, name="layer_norm2")(x)
        y = Dense(e, c.intermediate_size, dtype=c.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=True)   # gelu_pytorch_tanh
        y = Dense(c.intermediate_size, e, dtype=c.dtype, name="fc2")(y)
        return x + y


class SiglipTextTower(nn.Module):
    cfg: SiglipConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c, t = self.cfg, self.cfg.text
        b, s = input_ids.shape
        tok = nn.Embed(c.vocab_size, t.hidden_size, param_dtype=jnp.float32,
                       dtype=t.dtype, name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.max_position_embeddings, t.hidden_size),
                         jnp.float32)
        x = tok + pos[None, :s].astype(t.dtype)
        lengths = (jnp.sum(attention_mask.astype(jnp.int32), axis=1)
                   if attention_mask is not None else None)
        for i in range(t.num_hidden_layers):
            x = SiglipEncoderLayer(t, name=f"layers_{i}")(x, lengths)
        x = LayerNorm(t.hidden_size, t.layer_norm_eps, t.dtype,
                      name="final_layer_norm")(x)
        pooled = x[:, -1, :]                       # HF siglip :615
        pooled = Dense(t.hidden_size, c.projection_size, dtype=t.dtype,
                       name="head")(pooled)
        return x, pooled


class SiglipVisionTower(nn.Module):
    """Fixed-size vision tower (image_size²/patch² tokens) with MAP head."""
    cfg: SiglipConfig

    @nn.compact
    def __call__(self, patches):
        """patches: (B, N, 3*ps*ps) pre-patchified pixels (row-major)."""
        c, v = self.cfg, self.cfg.vision
        b, n, _ = patches.shape
        w = self.param("patch_embedding", nn.initializers.lecun_normal(),
                       (v.hidden_size, 3 * c.patch_size ** 2), jnp.float32)
        bias = self.param("patch_bias", nn.initializers.zeros,
                          (v.hidden_size,), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         ((c.image_size // c.patch_size) ** 2, v.hidden_size),
                         jnp.float32)
        x = (jnp.einsum("bnd,ed->bne", patches.astype(v.dtype),
                        w.astype(v.dtype)) + bias.astype(v.dtype))
        x = x + pos[None, :n].astype(v.dtype)
        for i in range(v.num_hidden_layers):
            x = SiglipEncoderLayer(v, name=f"layers_{i}")(x)
        x = LayerNorm(v.hidden_size, v.layer_norm_eps, v.dtype,
                      name="post_layernorm")(x)

        # MultiheadAttentionPoolingHead (HF :716-735): probe cross-attn +
        # LN + MLP residual, output token 0
        e, h = v.hidden_size, v.num_attention_heads
        probe = self.param("probe", nn.initializers.normal(0.02),
                           (1, 1, e), jnp.float32)
        in_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                          (3 * e, e), jnp.float32)
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,),
                          jnp.float32)
        wq, wk, wv = jnp.split(in_w, 3, 0)
        bq, bk, bv = jnp.split(in_b, 3, 0)
        d = e // h
        qh = (jnp.einsum("bqe,fe->bqf", jnp.broadcast_to(
            probe.astype(v.dtype), (b, 1, e)), wq.astype(v.dtype)) +
            bq.astype(v.dtype)).reshape(b, 1, h, d)
        kh = (jnp.einsum("bne,fe->bnf", x, wk.astype(v.dtype)) +
              bk.astype(v.dtype)).reshape(b, n, h, d)
        vh = (jnp.einsum("bne,fe->bnf", x, wv.astype(v.dtype)) +
              bv.astype(v.dtype)).reshape(b, n, h, d)
        s = jnp.einsum("bqhd,bnhd->bhqn", qh.astype(jnp.float32),
                       kh.astype(jnp.float32)) / (d ** 0.5)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqn,bnhd->bqhd", p, vh.astype(jnp.float32))
        o = Dense(e, e, dtype=v.dtype,
                  name="attn_out_proj")(o.reshape(b, 1, e).astype(v.dtype))

        y = LayerNorm(e, v.layer_norm_eps, v.dtype, name="map_layernorm")(o)
        y = Dense(e, v.intermediate_size, dtype=v.dtype, name="map_fc1")(y)
        y = nn.gelu(y, approximate=True)
        y = Dense(v.intermediate_size, e, dtype=v.dtype, name="map_fc2")(y)
        o = o + y
        return x, o[:, 0, :]


class SiglipModel(nn.Module):
    """Bi-tower with logit_scale/bias; pooled outputs are the retriever
    embeddings (`siglip_pooling`)."""
    cfg: SiglipConfig

    def setup(self):
        self.text_model = SiglipTextTower(self.cfg, name="text_model")
        self.vision_model = SiglipVisionTower(self.cfg, name="vision_model")
        self.logit_scale = self.param("logit_scale",
                                      nn.initializers.constant(1.0), ())
        self.logit_bias = self.param("logit_bias",
                                     nn.initializers.zeros, ())

    def encode_text(self, input_ids, attention_mask=None):
        _, pooled = self.text_model(input_ids, attention_mask)
        return pooled

    def encode_image(self, patches):
        _, pooled = self.vision_model(patches)
        return pooled

    def __call__(self, input_ids=None, patches=None, attention_mask=None):
        t = self.encode_text(input_ids, attention_mask) \
            if input_ids is not None else None
        v = self.encode_image(patches) if patches is not None else None
        return t, v
