"""MiniCPM-2B language model (Llama-family with MUP-style scalings) in JAX.

Behavioral parity with the reference implementation at
/root/reference/src/openmatch/modeling/modeling_minicpmv/modeling_minicpm.py:
  * embed_tokens(ids) * scale_emb                          (:1213)
  * residual += sublayer_out * scale_depth/sqrt(L)         (:984,:993)
  * logits = lm_head(hidden / (hidden_size/dim_model_base)) (:1412)
  * RMSNorm eps 1e-5 (model config), RoPE theta 10000 applied in fp32 (:280-291)

TPU-first: attention runs through ops.flash_attention (Pallas on TPU) with the
padding mask as segment ids; causal vs bidirectional is a config flag
(reference sets config.is_causal=False for retrieval,
dense_retrieval_model.py:282-287). Blocks are scanned with optional remat.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from .common import (Dense, QuantDense, RMSNorm, apply_rope,
                     dynamic_ntk_inv_freq, rope_frequencies)


@dataclasses.dataclass(frozen=True)
class MiniCPMConfig:
    vocab_size: int = 122753
    hidden_size: int = 2304
    intermediate_size: int = 5760
    num_hidden_layers: int = 40
    num_attention_heads: int = 36
    num_key_value_heads: int = 36
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    # HF config.rope_scaling (reference modeling_minicpm.py:142-291):
    # "" = none, "linear" divides positions, "dynamic" = NTK theta rescale
    rope_scaling_type: str = ""
    rope_scaling_factor: float = 1.0
    scale_emb: float = 12.0
    dim_model_base: int = 256
    scale_depth: float = 1.4
    max_position_embeddings: int = 4096
    is_causal: bool = True
    dtype: Any = jnp.bfloat16
    # False | True (whole-block remat) | "mlp" (remat only the MLP — the
    # attention fwd is never recomputed in bwd; see SiglipViTConfig.remat)
    remat: Any = False
    # "int8": w8a8 projections + MLP (2x MXU rate; inference-only, opt-in —
    # see ops/quant.py and SiglipViTConfig.quant)
    quant: str = "none"
    # "auto": XLA-fused attention for right-padded inference (measured
    # 10.6 vs 13.5 ms/block at the encode shape B=16 S=576 d=64 — the
    # kernel's d pad 64->128 + transposes lose at short causal seqs),
    # flash kernel when remat (training) or packed (segment ids).
    # "flash"/"xla" force.
    attn_impl: str = "auto"

    def __post_init__(self):
        # int8 is inference-only: the Pallas GEMM has no VJP and the XLA
        # fallback's round() has zero gradient — training under quant would
        # silently produce broken grads. remat is the training signal.
        if self.quant != "none" and self.remat:
            raise ValueError(
                "quant='int8' is inference-only (no VJP); remat=True marks a "
                "training config — use quant='none' for training")

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw):
        """Small config for tests."""
        defaults = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=4, dtype=jnp.float32)
        defaults.update(kw)
        return cls(**defaults)


class MiniCPMMLP(nn.Module):
    cfg: MiniCPMConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        D = QuantDense if c.quant == "int8" else Dense
        gate = D(c.hidden_size, c.intermediate_size, use_bias=False,
                 dtype=c.dtype, name="gate_proj")(x)
        up = D(c.hidden_size, c.intermediate_size, use_bias=False,
               dtype=c.dtype, name="up_proj")(x)
        # down stays bf16: large-K int8 + the silu*up quant pass is a wash
        return Dense(c.intermediate_size, c.hidden_size, use_bias=False,
                     dtype=c.dtype, name="down_proj")(nn.silu(gate) * up)


class MiniCPMAttention(nn.Module):
    cfg: MiniCPMConfig

    def setup(self):
        c = self.cfg
        h, hk, d = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        D = QuantDense if c.quant == "int8" else Dense
        self.q_proj = D(c.hidden_size, h * d, use_bias=False,
                        dtype=c.dtype, name="q_proj")
        self.k_proj = D(c.hidden_size, hk * d, use_bias=False,
                        dtype=c.dtype, name="k_proj")
        self.v_proj = D(c.hidden_size, hk * d, use_bias=False,
                        dtype=c.dtype, name="v_proj")
        self.o_proj = D(h * d, c.hidden_size, use_bias=False,
                        dtype=c.dtype, name="o_proj")

    def _qkv(self, x, positions, seq_lens=None):
        """seq_lens: optional (B,) traced live kv lengths — drives the
        per-row dynamic-NTK theta (HF recomputes from the live kv_seq_len
        each forward); without it the static trace length S is used
        (exact for training, where S is the real length)."""
        c = self.cfg
        b, s, _ = x.shape
        h, hk, d = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        q = self.q_proj(x).reshape(b, s, h, d)
        k = self.k_proj(x).reshape(b, s, hk, d)
        v = self.v_proj(x).reshape(b, s, hk, d)
        scaling = {"type": c.rope_scaling_type,
                   "factor": c.rope_scaling_factor} \
            if c.rope_scaling_type else None
        if scaling and scaling["type"] == "dynamic" and seq_lens is not None:
            inv_freq = dynamic_ntk_inv_freq(
                d, c.rope_theta, c.rope_scaling_factor,
                c.max_position_embeddings, seq_lens)
        else:
            inv_freq = jnp.asarray(rope_frequencies(
                d, c.rope_theta, scaling=scaling,
                max_positions=c.max_position_embeddings, seq_len=s))
        q, k = apply_rope(q, k, positions, inv_freq, scaling=scaling)
        return q, k, v

    def __call__(self, x, positions, segment_ids=None, lengths=None,
                 return_kv=False):
        c = self.cfg
        b, s, _ = x.shape
        q, k, v = self._qkv(x, positions, seq_lens=lengths)
        if lengths is not None:
            use_xla = c.attn_impl == "xla" or (c.attn_impl == "auto"
                                               and not c.remat)
            if use_xla and jax.default_backend() == "tpu":
                from ..ops.attention import xla_lengths_attention
                o = xla_lengths_attention(q, k, v, lengths,
                                          causal=c.is_causal)
            else:
                o = flash_attention(q, k, v, lengths=lengths,
                                    causal=c.is_causal)
        else:
            o = flash_attention(q, k, v, segment_ids, segment_ids,
                                causal=c.is_causal)
        out = self.o_proj(o.reshape(b, s, -1))
        return (out, (k, v)) if return_kv else out

    def decode(self, x, positions, kc, vc, lengths_incl, block_table=None,
               mesh=None):
        """One-token step on THIS layer's cache arrays — dense (B, L, kvh, d)
        or a paged per-layer pool when block_table is given (see
        qwen25_vl.QwenAttention.decode). mesh: optional TP mesh threaded to
        the paged kernel (serving/paged_kv.paged_decode_attention)."""
        b = x.shape[0]
        # per-row live kv lengths drive the dynamic-NTK theta (exact HF
        # semantics — not the KV-buffer capacity, which over-rescales
        # short sequences in a large cache)
        q, k, v = self._qkv(x, positions, seq_lens=lengths_incl)
        pos = lengths_incl - 1
        if block_table is None:
            from ..serving.kv_cache import decode_attention
            kc = kc.at[jnp.arange(b), pos].set(k[:, 0].astype(kc.dtype))
            vc = vc.at[jnp.arange(b), pos].set(v[:, 0].astype(vc.dtype))
            o = decode_attention(q[:, 0], kc, vc, lengths_incl)
        else:
            from ..serving.paged_kv import (paged_decode_attention,
                                            write_token)
            kc = write_token(kc, block_table, pos, k[:, 0])
            vc = write_token(vc, block_table, pos, v[:, 0])
            o = paged_decode_attention(q[:, 0], kc, vc, block_table,
                                       lengths_incl, mesh=mesh)
        return (self.o_proj(o[:, None].reshape(b, 1, -1)), kc, vc)


class MiniCPMBlock(nn.Module):
    cfg: MiniCPMConfig

    def setup(self):
        c = self.cfg
        self.self_attn = MiniCPMAttention(c, name="self_attn")
        self.input_layernorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype,
                                       name="input_layernorm")
        self.post_attention_layernorm = RMSNorm(
            c.hidden_size, c.rms_norm_eps, c.dtype,
            name="post_attention_layernorm")
        self.mlp = MiniCPMMLP(c, name="mlp")
        self.depth_scale = c.scale_depth / (c.num_hidden_layers ** 0.5)

    def __call__(self, x, positions, segment_ids=None, lengths=None,
                 return_kv=False):
        a = self.self_attn(self.input_layernorm(x), positions, segment_ids,
                           lengths, return_kv=return_kv)
        if return_kv:
            a, kv = a
        x = x + a * self.depth_scale
        if self.cfg.remat == "mlp":
            m = nn.remat(MiniCPMBlock._mlp_part)(self, x)
        else:
            m = self._mlp_part(x)
        out = x + m * self.depth_scale
        return (out, kv) if return_kv else out

    def _mlp_part(self, x):
        return self.mlp(self.post_attention_layernorm(x))

    def decode(self, x, positions, kc, vc, lengths_incl, block_table=None,
               mesh=None):
        a, kc, vc = self.self_attn.decode(
            self.input_layernorm(x), positions, kc, vc, lengths_incl,
            block_table, mesh=mesh)
        x = x + a * self.depth_scale
        m = self.mlp(self.post_attention_layernorm(x))
        return x + m * self.depth_scale, kc, vc


class MiniCPMModel(nn.Module):
    """Decoder stack; returns final hidden states (pre-lm_head)."""
    cfg: MiniCPMConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size,
                                     param_dtype=jnp.float32, dtype=c.dtype,
                                     name="embed_tokens")
        block = MiniCPMBlock
        if c.remat and c.remat != "mlp":
            block = nn.remat(MiniCPMBlock)  # see siglip_vit: CSE undoes remat
        self.layers = [block(c, name=f"layers_{i}")
                       for i in range(c.num_hidden_layers)]
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype, name="norm")

    def __call__(self, input_ids=None, *, inputs_embeds=None,
                 attention_mask=None, positions=None, segment_ids=None,
                 return_kv=False):
        """attention_mask must be a contiguous right-padded validity mask
        (fast lengths kernel); pass segment_ids instead for packed batches."""
        c = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_only(input_ids)
        b, s, _ = inputs_embeds.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        if segment_ids is not None:
            seg, lengths = segment_ids.astype(jnp.int32), None
        else:
            if attention_mask is None:
                attention_mask = jnp.ones((b, s), jnp.int32)
            seg = None
            lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=1)

        x = inputs_embeds.astype(c.dtype)
        kvs = []
        for layer in self.layers:
            if return_kv:
                x, kv = layer(x, positions, seg, lengths, return_kv=True)
                kvs.append(kv)
            else:
                x = layer(x, positions, seg, lengths)
        out = self.norm(x)
        return (out, kvs) if return_kv else out

    def decode(self, inputs_embeds, positions, k_cache, v_cache, lengths_incl,
               block_table=None, mesh=None):
        """One decode step; k_cache/v_cache are TUPLES of per-layer arrays.
        Returns (hidden, k_cache, v_cache) with this token's K/V written at
        lengths_incl-1 (donate the caches)."""
        x = inputs_embeds.astype(self.cfg.dtype)
        kcs, vcs = list(k_cache), list(v_cache)
        for i, layer in enumerate(self.layers):
            x, kcs[i], vcs[i] = layer.decode(x, positions, kcs[i], vcs[i],
                                             lengths_incl, block_table,
                                             mesh=mesh)
        return self.norm(x), tuple(kcs), tuple(vcs)

    def embed_only(self, input_ids):
        """Token embeddings * scale_emb (for vision scatter composition)."""
        return self.embed_tokens(input_ids) * self.cfg.scale_emb


class MiniCPMForCausalLM(nn.Module):
    cfg: MiniCPMConfig

    @nn.compact
    def __call__(self, input_ids=None, *, inputs_embeds=None,
                 attention_mask=None, positions=None):
        c = self.cfg
        hidden = MiniCPMModel(c, name="model")(
            input_ids, inputs_embeds=inputs_embeds,
            attention_mask=attention_mask, positions=positions)
        # MUP logit scaling (reference modeling_minicpm.py:1412)
        scaled = hidden / (c.hidden_size / c.dim_model_base)
        logits = Dense(c.hidden_size, c.vocab_size, use_bias=False,
                       dtype=c.dtype, name="lm_head")(scaled)
        return logits, hidden


@dataclasses.dataclass(frozen=True)
class MiniCPMGenConfig:
    """Text-only MiniCPM-2B generation on the serving engine — the
    reference's 'MiniCPM' VisRAG-Gen backend for the OCR-text baseline
    (visrag_scripts/generate/generate.py:28,249-251 loads the plain
    AutoModelForCausalLM checkpoint; task_type 'text')."""
    llm: MiniCPMConfig = MiniCPMConfig()

    @property
    def text(self):
        """Engine cache-shape contract (serving.engine reads cfg.text)."""
        return self.llm

    @classmethod
    def tiny(cls, **kw):
        d = dict(llm=MiniCPMConfig.tiny())
        d.update(kw)
        return cls(**d)


class MiniCPMForGeneration(nn.Module):
    """MiniCPMForCausalLM with the engine's prefill/decode contract."""
    cfg: MiniCPMGenConfig

    def setup(self):
        c = self.cfg.llm
        self.model = MiniCPMModel(c, name="model")
        self.lm_head = Dense(c.hidden_size, c.vocab_size, use_bias=False,
                             dtype=c.dtype, name="lm_head")

    def _logits(self, hidden):
        c = self.cfg.llm
        return self.lm_head(hidden / (c.hidden_size / c.dim_model_base))

    def __call__(self, input_ids, attention_mask=None, positions=None,
                 vision_batch=None, slot_map=None):
        del vision_batch, slot_map  # text-only
        if positions is not None and positions.ndim == 3:
            positions = positions[0]
        hidden = self.model(input_ids, attention_mask=attention_mask,
                            positions=positions)
        return self._logits(hidden), hidden

    def prefill(self, input_ids, attention_mask=None, positions=None,
                vision_batch=None, slot_map=None, last_pos=None):
        del vision_batch, slot_map
        if positions is not None and positions.ndim == 3:
            positions = positions[0]
        hidden, kvs = self.model(input_ids, attention_mask=attention_mask,
                                 positions=positions, return_kv=True)
        k = jnp.stack([kv[0] for kv in kvs])
        v = jnp.stack([kv[1] for kv in kvs])
        if last_pos is not None:   # logits only at prompt end (see qwen25_vl)
            hidden = jnp.take_along_axis(
                hidden, last_pos[:, None, None].astype(jnp.int32), axis=1)
            return self._logits(hidden)[:, 0], k, v
        return self._logits(hidden), k, v

    def decode(self, token_ids, positions, k_cache, v_cache, lengths_incl,
               block_table=None, mesh=None):
        embeds = self.model.embed_only(token_ids)
        if positions.ndim == 3:
            positions = positions[0]
        hidden, k_cache, v_cache = self.model.decode(
            embeds, positions, k_cache, v_cache, lengths_incl, block_table,
            mesh=mesh)
        return self._logits(hidden)[:, 0], k_cache, v_cache
