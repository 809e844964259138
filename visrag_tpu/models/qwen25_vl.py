"""Qwen2.5-VL (3B/7B) in JAX — the EVisRAG model family.

Replaces the reference's HF+flash-attn+Ulysses monkey-patched model
(/root/reference/src/rsgrpo/verl/models/transformers/qwen2_vl.py and
monkey_patch.py) and the vLLM serving model (src/evisrag/predict.py:112-117)
with one flax implementation used for training AND serving.

TPU-first vision tower: the HF implementation splits per-window chunks in a
Python loop under sdpa (modeling_qwen2_5_vl.py:239-260); here window/full
attention are both ONE packed flash-attention call with segment ids (windows
are segments; full-attention layers use per-image segments), on a
statically-padded patch stream. Host prep (preprocess/qwen_vision.py) supplies
the window permutation, segment ids, and rotary tables.

Text model: Qwen2 decoder (GQA, qkv bias, RMSNorm, SwiGLU, rope θ=1e6) with
3-D mrope sections (models/mrope.py) and tied embeddings for the 3B size.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import flash_attention
from ..ops.attention_kvgrid import flash_attention_kvgrid
from .common import Dense, RMSNorm
from .mrope import apply_rope_cos_sin, mrope_cos_sin


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class QwenVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3456
    num_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    out_hidden_size: int = 2048
    rms_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    remat: bool = False
    # "auto": banded kvgrid kernel on TPU (window layers skip out-of-band
    # K blocks; any S lowers). "packed": the legacy full-scan segment kernel.
    attn_impl: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return 3 * self.temporal_patch_size * self.patch_size ** 2  # 1176

    @classmethod
    def tiny(cls, **kw):
        d = dict(depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
                 fullatt_block_indexes=(1,), out_hidden_size=48,
                 dtype=jnp.float32)
        d.update(kw)
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class QwenTextConfig:
    vocab_size: int = 151936
    hidden_size: int = 2048
    intermediate_size: int = 11008
    num_hidden_layers: int = 36
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    tie_word_embeddings: bool = True
    dtype: Any = jnp.bfloat16
    # False | True (whole-block) | "mlp" (selective; SiglipViTConfig.remat)
    remat: Any = False
    # sequence-parallel attention backend when an sp_mesh is passed:
    # "ulysses" (all_to_all head sharding) | "ring" (ppermute k/v rotation)
    sp_backend: str = "ulysses"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=128, hidden_size=48, intermediate_size=96,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=2, mrope_section=(2, 2, 2),
                 dtype=jnp.float32)
        d.update(kw)
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class Qwen25VLConfig:
    vision: QwenVisionConfig = QwenVisionConfig()
    text: QwenTextConfig = QwenTextConfig()
    image_token_id: int = 151655
    vision_start_token_id: int = 151652

    @classmethod
    def b3(cls):
        """Qwen2.5-VL-3B-Instruct dims."""
        return cls(vision=QwenVisionConfig(out_hidden_size=2048),
                   text=QwenTextConfig())

    @classmethod
    def b7(cls):
        """Qwen2.5-VL-7B-Instruct dims."""
        return cls(
            vision=QwenVisionConfig(out_hidden_size=3584),
            text=QwenTextConfig(hidden_size=3584, intermediate_size=18944,
                                num_hidden_layers=28, num_attention_heads=28,
                                num_key_value_heads=4, vocab_size=152064,
                                tie_word_embeddings=False))

    @classmethod
    def b32(cls):
        """Qwen2.5-VL-32B-Instruct dims (the reference's GRPO 32B rows run
        it under TP8, assets/baselines.md:26,42 — kvh=8 admits tp ≤ 8
        through Engine(mesh=))."""
        return cls(
            vision=QwenVisionConfig(out_hidden_size=5120),
            text=QwenTextConfig(hidden_size=5120, intermediate_size=27648,
                                num_hidden_layers=64, num_attention_heads=40,
                                num_key_value_heads=8, vocab_size=152064,
                                tie_word_embeddings=False))

    @classmethod
    def b72(cls):
        """Qwen2.5-VL-72B-Instruct dims (reference hardware-floor table,
        rsgrpo/README.md:55-59)."""
        return cls(
            vision=QwenVisionConfig(out_hidden_size=8192),
            text=QwenTextConfig(hidden_size=8192, intermediate_size=29568,
                                num_hidden_layers=80, num_attention_heads=64,
                                num_key_value_heads=8, vocab_size=152064,
                                rms_norm_eps=1e-5,
                                tie_word_embeddings=False))

    @classmethod
    def tiny(cls, **kw):
        d = dict(vision=QwenVisionConfig.tiny(out_hidden_size=48),
                 text=QwenTextConfig.tiny(),
                 image_token_id=120, vision_start_token_id=119)
        d.update(kw)
        return cls(**d)

    @classmethod
    def from_hf(cls, d: dict, dtype=jnp.bfloat16) -> "Qwen25VLConfig":
        """Build from an HF checkpoint's config.json dict — flat (original
        Qwen2.5-VL releases) or nested text_config/vision_config layouts —
        so the drivers serve ANY Qwen2.5-VL geometry, not just the preset
        table. Fields absent from the json keep the 3B defaults."""
        t = d.get("text_config") or d
        v = d.get("vision_config") or {}

        def pick(src, config_cls, skip=("dtype", "remat", "sp_backend")):
            names = {f.name for f in dataclasses.fields(config_cls)}
            return {k: (tuple(x) if isinstance(x := src[k], list) else x)
                    for k in src
                    if k in names and k not in skip
                    and not isinstance(src[k], dict)}

        tkw = pick(t, QwenTextConfig)
        rs = t.get("rope_scaling") or {}
        if rs.get("mrope_section"):
            tkw["mrope_section"] = tuple(rs["mrope_section"])
        return cls(
            vision=QwenVisionConfig(dtype=dtype, **pick(v, QwenVisionConfig)),
            text=QwenTextConfig(dtype=dtype, **tkw),
            image_token_id=d.get("image_token_id", 151655),
            vision_start_token_id=d.get("vision_start_token_id", 151652))


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


class QwenVisionBlock(nn.Module):
    cfg: QwenVisionConfig
    full_att: bool = False   # full-attention layer (per-image segments)

    @nn.compact
    def __call__(self, x, cos, sin, seg):
        c = self.cfg
        s, e = x.shape
        h, d = c.num_heads, c.head_dim
        y = RMSNorm(e, c.rms_eps, c.dtype, name="norm1")(x)
        qkv = Dense(e, 3 * e, use_bias=True, dtype=c.dtype, name="attn_qkv")(y)
        q, k, v = jnp.split(qkv.reshape(s, 3, h, d), 3, axis=1)
        q, k, v = (t[:, 0][None] for t in (q, k, v))       # (1, S, H, D)
        q, k = apply_rope_cos_sin(q, k, cos[None], sin[None])
        if c.attn_impl not in ("auto", "banded", "packed"):
            raise ValueError(
                f"QwenVisionConfig.attn_impl {c.attn_impl!r}: expected "
                "'auto' (banded on TPU, packed elsewhere), 'banded', or "
                "'packed'")
        if c.attn_impl == "banded" or (
                c.attn_impl == "auto" and jax.default_backend() == "tpu"):
            # banded kernel: window segments are bounded by the window grid
            # (preprocess/qwen_vision.window_index caps them at vit_ws²·mu);
            # full-attention layers band per image span with an open bound
            msl = None if self.full_att else (
                (c.window_size // c.spatial_merge_size // c.patch_size) ** 2
                * c.spatial_merge_size ** 2)
            o = flash_attention_kvgrid(q, k, v, seg[None], max_seg_len=msl)
        else:
            o = flash_attention(q, k, v, seg[None], seg[None], causal=False)
        o = Dense(e, e, use_bias=True, dtype=c.dtype,
                  name="attn_proj")(o.reshape(s, e))
        x = x + o
        y = RMSNorm(e, c.rms_eps, c.dtype, name="norm2")(x)
        gate = Dense(e, c.intermediate_size, use_bias=True, dtype=c.dtype,
                     name="mlp_gate")(y)
        up = Dense(e, c.intermediate_size, use_bias=True, dtype=c.dtype,
                   name="mlp_up")(y)
        y = Dense(c.intermediate_size, e, use_bias=True, dtype=c.dtype,
                  name="mlp_down")(nn.silu(gate) * up)
        return x + y


class QwenVisionTower(nn.Module):
    """Packed-stream vision tower.

    Inputs (host-prepared, window-permuted order, padded to S_pad):
      patches:    (S_pad, patch_dim) pixel patches;
      rot_cos/rot_sin: (S_pad, head_dim) rotary tables;
      seg_window: (S_pad,) window segment ids (≥1 real, 0 pad);
      seg_full:   (S_pad,) image segment ids for full-attention layers;
      reverse_index: (S_pad/merge²,) gather indices restoring image order on
                  the merged stream (pad slots point at a pad row).
    Returns (S_pad/merge², out_hidden) merged tokens in image order.
    """
    cfg: QwenVisionConfig

    @nn.compact
    def __call__(self, patches, rot_cos, rot_sin, seg_window, seg_full,
                 reverse_index):
        c = self.cfg
        x = Dense(c.patch_dim, c.hidden_size, use_bias=False, dtype=c.dtype,
                  name="patch_embed")(patches.astype(c.dtype))
        block = QwenVisionBlock
        if c.remat:
            block = nn.remat(QwenVisionBlock)  # see siglip_vit: CSE undoes remat
        for i in range(c.depth):
            full = i in c.fullatt_block_indexes
            seg = seg_full if full else seg_window
            x = block(c, full_att=full,
                      name=f"blocks_{i}")(x, rot_cos, rot_sin, seg)

        # merger: RMSNorm then group merge² neighbors → MLP
        mu = c.spatial_merge_size ** 2
        y = RMSNorm(c.hidden_size, c.rms_eps, c.dtype, name="merger_ln_q")(x)
        y = y.reshape(-1, mu * c.hidden_size)
        y = Dense(mu * c.hidden_size, mu * c.hidden_size, use_bias=True,
                  dtype=c.dtype, name="merger_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = Dense(mu * c.hidden_size, c.out_hidden_size, use_bias=True,
                  dtype=c.dtype, name="merger_fc2")(y)
        return y[reverse_index]


# ---------------------------------------------------------------------------
# Text model
# ---------------------------------------------------------------------------


class QwenTextBlock(nn.Module):
    cfg: QwenTextConfig

    def setup(self):
        c = self.cfg
        e = c.hidden_size
        h, hk, d = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        self.input_layernorm = RMSNorm(e, c.rms_norm_eps, c.dtype,
                                       name="input_layernorm")
        self.attn_q = Dense(e, h * d, use_bias=True, dtype=c.dtype, name="attn_q")
        self.attn_k = Dense(e, hk * d, use_bias=True, dtype=c.dtype, name="attn_k")
        self.attn_v = Dense(e, hk * d, use_bias=True, dtype=c.dtype, name="attn_v")
        self.attn_o = Dense(h * d, e, use_bias=False, dtype=c.dtype, name="attn_o")
        self.post_attention_layernorm = RMSNorm(
            e, c.rms_norm_eps, c.dtype, name="post_attention_layernorm")
        self.mlp_gate = Dense(e, c.intermediate_size, use_bias=False,
                              dtype=c.dtype, name="mlp_gate")
        self.mlp_up = Dense(e, c.intermediate_size, use_bias=False,
                            dtype=c.dtype, name="mlp_up")
        self.mlp_down = Dense(c.intermediate_size, e, use_bias=False,
                              dtype=c.dtype, name="mlp_down")

    def _qkv(self, x, cos, sin):
        c = self.cfg
        b, s, e = x.shape
        h, hk, d = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        y = self.input_layernorm(x)
        q = self.attn_q(y).reshape(b, s, h, d)
        k = self.attn_k(y).reshape(b, s, hk, d)
        v = self.attn_v(y).reshape(b, s, hk, d)
        q, k = apply_rope_cos_sin(q, k, cos, sin)
        return q, k, v

    def _mlp_residual(self, x, attn_out):
        b, s, _ = x.shape
        x = x + self.attn_o(attn_out.reshape(b, s, -1))
        if self.cfg.remat == "mlp":
            # selective remat (see SiglipViTConfig.remat): bwd recomputes
            # only the MLP; attention activations stay saved
            y = nn.remat(QwenTextBlock._mlp_part)(self, x)
        else:
            y = self._mlp_part(x)
        return x + y

    def _mlp_part(self, x):
        y = self.post_attention_layernorm(x)
        return self.mlp_down(nn.silu(self.mlp_gate(y)) * self.mlp_up(y))

    def __call__(self, x, cos, sin, seg, lengths, return_kv=False,
                 sp_mesh=None):
        q, k, v = self._qkv(x, cos, sin)
        if sp_mesh is not None:
            # sequence parallelism over the mesh's `seq` axis (reference
            # dp_actor.py:109-116 when ulysses_size > 1); cfg.sp_backend
            # picks Ulysses all_to_all or ring ppermute
            from ..parallel.ulysses import sp_flash_attention
            o = sp_flash_attention(q, k, v, q_seg=seg, kv_seg=seg,
                                   lengths=lengths, causal=True, mesh=sp_mesh,
                                   backend=self.cfg.sp_backend)
        elif lengths is not None:
            o = flash_attention(q, k, v, lengths=lengths, causal=True)
        else:
            o = flash_attention(q, k, v, seg, seg, causal=True)
        out = self._mlp_residual(x, o)
        return (out, (k, v)) if return_kv else out

    def prefill_chunk(self, x, cos, sin, kc, vc, chunk_rows, gather_rows,
                      start):
        """Chunked-prefill step for ONE request (B=1): x (1, C, E) holds the
        prompt tokens at global positions start + arange(C) (start and C are
        block-aligned). Writes this chunk's K/V into the paged pool at
        chunk_rows, then attends the chunk against the FULL prefix gathered
        from gather_rows (pool blocks covering [0, start+C)) with the
        global-position causal mask (ops.attention.xla_chunk_attention).
        The vLLM chunked-prefill role: a 15k-token prompt becomes
        ceil(15k/C) bounded dispatches interleavable with decode chunks."""
        from ..ops.attention import xla_chunk_attention
        from ..serving.paged_kv import pool_gather, pool_write_rows
        c = self.cfg
        q, k, v = self._qkv(x, cos, sin)
        bs = (kc.data if hasattr(kc, "data") else kc).shape[2]
        C = x.shape[1]
        kvh, d = c.num_key_value_heads, c.head_dim
        kb = jnp.swapaxes(k[0].reshape(C // bs, bs, kvh, d), 1, 2)
        vb = jnp.swapaxes(v[0].reshape(C // bs, bs, kvh, d), 1, 2)
        kc = pool_write_rows(kc, chunk_rows, kb)
        vc = pool_write_rows(vc, chunk_rows, vb)
        ng = gather_rows.shape[0]
        kg = jnp.swapaxes(pool_gather(kc, gather_rows, q.dtype),
                          1, 2).reshape(1, ng * bs, kvh, d)
        vg = jnp.swapaxes(pool_gather(vc, gather_rows, q.dtype),
                          1, 2).reshape(1, ng * bs, kvh, d)
        o = xla_chunk_attention(q, kg.astype(q.dtype), vg.astype(q.dtype),
                                jnp.asarray([start]).reshape(1)
                                if not hasattr(start, "ndim") else
                                start.reshape(1))
        return self._mlp_residual(x, o), kc, vc

    def decode(self, x, cos, sin, kc, vc, lengths_incl, block_table=None,
               mesh=None):
        """x (B, 1, E); lengths_incl counts INCLUDING this step's token.
        kc/vc: THIS layer's cache — dense (B, L_max, kvh, d) when block_table
        is None, else a paged per-layer pool (n_blocks, kvh, bs, d) indexed
        by block_table (B, max_blk). Per-layer arrays (not a layer-stacked
        slab) keep XLA's scatter in-place under donation. Writes this token's
        K/V at lengths_incl-1 and returns (out, kc, vc). mesh: optional TP
        mesh for the paged kernel (see paged_kv.paged_decode_attention)."""
        q, k, v = self._qkv(x, cos, sin)
        b = x.shape[0]
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
        out = self._mlp_residual(x, o[:, None])
        return out, kc, vc


class QwenTextModel(nn.Module):
    cfg: QwenTextConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size,
                                     param_dtype=jnp.float32, dtype=c.dtype,
                                     name="embed_tokens")
        block = QwenTextBlock
        if c.remat and c.remat != "mlp":
            block = nn.remat(QwenTextBlock)
        self.layers = [block(c, name=f"layers_{i}")
                       for i in range(c.num_hidden_layers)]
        self.norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype,
                            name="norm")

    def _cos_sin(self, positions, b, s):
        c = self.cfg
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        if positions.ndim == 2:
            positions = jnp.broadcast_to(positions[None], (3, b, s))
        inv_freq = 1.0 / (c.rope_theta ** (
            jnp.arange(0, c.head_dim, 2, dtype=jnp.float32) / c.head_dim))
        return mrope_cos_sin(positions, inv_freq, c.mrope_section)

    def __call__(self, input_ids=None, *, inputs_embeds=None, positions=None,
                 attention_mask=None, segment_ids=None, return_kv=False,
                 sp_mesh=None):
        """positions: (3, B, S) mrope streams (or (B, S) → broadcast).
        sp_mesh: optional mesh with a seq axis > 1 — hidden states are
        sequence-sharded across layers and attention runs Ulysses
        (parallel/ulysses.sp_flash_attention); activation memory scales
        S/seq per device (the reference's 15k-token RS-GRPO prompts)."""
        c = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        b, s, _ = inputs_embeds.shape
        cos, sin = self._cos_sin(positions, b, s)

        if segment_ids is not None:
            seg, lengths = segment_ids.astype(jnp.int32), None
        else:
            if attention_mask is None:
                attention_mask = jnp.ones((b, s), jnp.int32)
            seg = None
            lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=1)

        x = inputs_embeds.astype(c.dtype)
        if sp_mesh is not None and dict(sp_mesh.shape).get("seq", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(sp_mesh, P(("replica", "data"), "seq",
                                            None)))
        else:
            sp_mesh = None
        kvs = []
        for layer in self.layers:
            if return_kv:
                x, kv = layer(x, cos, sin, seg, lengths, return_kv=True,
                              sp_mesh=sp_mesh)
                kvs.append(kv)
            else:
                x = layer(x, cos, sin, seg, lengths, sp_mesh=sp_mesh)
        out = self.norm(x)
        return (out, kvs) if return_kv else out

    def decode(self, inputs_embeds, positions, k_cache, v_cache, lengths_incl,
               block_table=None, mesh=None):
        """One decode step. inputs_embeds (B, 1, E); positions (3, B, 1);
        k_cache/v_cache are TUPLES of per-layer dense stacks or paged pools
        (see QwenAttention.decode), donated. Returns
        (hidden (B,1,E), k_cache, v_cache)."""
        b = inputs_embeds.shape[0]
        cos, sin = self._cos_sin(positions, b, 1)
        x = inputs_embeds.astype(self.cfg.dtype)
        kcs, vcs = list(k_cache), list(v_cache)
        for i, layer in enumerate(self.layers):
            x, kcs[i], vcs[i] = layer.decode(x, cos, sin, kcs[i], vcs[i],
                                             lengths_incl, block_table,
                                             mesh=mesh)
        return self.norm(x), tuple(kcs), tuple(vcs)

    def prefill_chunk(self, inputs_embeds, positions, k_cache, v_cache,
                      chunk_rows, gather_rows, start):
        """Chunked prefill over the layer stack (QwenTextBlock.prefill_chunk;
        B=1, C = inputs_embeds.shape[1], block-aligned)."""
        cos, sin = self._cos_sin(positions, 1, inputs_embeds.shape[1])
        x = inputs_embeds.astype(self.cfg.dtype)
        kcs, vcs = list(k_cache), list(v_cache)
        for i, layer in enumerate(self.layers):
            x, kcs[i], vcs[i] = layer.prefill_chunk(
                x, cos, sin, kcs[i], vcs[i], chunk_rows, gather_rows, start)
        return self.norm(x), tuple(kcs), tuple(vcs)


class QwenForValue(nn.Module):
    """Token-level value head over the Qwen text stack — the critic model
    (reference dp_critic.py loads AutoModelForTokenClassification with one
    label). Multimodal prompts enter via `vision_embeds` + `slot_map`: a
    precomputed frozen-tower embedding table scattered into the token
    embeds, the same contract as the actor's RL update path — this is the
    reference critic's `multi_modal_inputs` forward (dp_critic.py:64-68,
    99,117; both towers are frozen and initialized from the same base, so
    one table serves actor and critic). Returns (B, S) fp32 values."""
    cfg: QwenTextConfig

    def setup(self):
        self.model = QwenTextModel(self.cfg, name="model")
        self.score = Dense(self.cfg.hidden_size, 1, use_bias=False,
                           dtype=jnp.float32, name="score")

    def __call__(self, input_ids, attention_mask=None, positions=None,
                 segment_ids=None, slot_map=None, vision_embeds=None):
        embeds = self.model.embed_tokens(input_ids)
        if vision_embeds is not None and slot_map is not None:
            safe = jnp.maximum(slot_map, 0)
            gathered = vision_embeds[safe.reshape(-1)] \
                .reshape(*slot_map.shape, -1)
            embeds = jnp.where((slot_map >= 0)[..., None],
                               gathered.astype(embeds.dtype), embeds)
        hidden = self.model(inputs_embeds=embeds, positions=positions,
                            attention_mask=attention_mask,
                            segment_ids=segment_ids)
        return self.score(hidden.astype(jnp.float32))[..., 0]


class Qwen25VL(nn.Module):
    """Full conditional-generation model: vision tokens scattered into the
    text stream by slot map (same contract as MiniCPMV), then lm_head."""
    cfg: Qwen25VLConfig

    def setup(self):
        self.visual = QwenVisionTower(self.cfg.vision, name="visual")
        self.model = QwenTextModel(self.cfg.text, name="model")
        if not self.cfg.text.tie_word_embeddings:
            self.lm_head = Dense(self.cfg.text.hidden_size,
                                 self.cfg.text.vocab_size, use_bias=False,
                                 dtype=self.cfg.text.dtype, name="lm_head")

    def encode_images(self, vision_batch: dict):
        patches = vision_batch["patches"]
        if patches.dtype == jnp.uint8:
            # device-mode batch (prepare_vision_batch device_mode=True):
            # CLIP normalization runs in-jit — fused into the patch-embed
            # matmul by XLA; host ships 4× fewer bytes. Flat patch layout is
            # channel-major (c, t, ps, ps), so per-channel constants repeat
            # dim//3 times.
            from ..preprocess.qwen_vision import (OPENAI_CLIP_MEAN,
                                                  OPENAI_CLIP_STD)
            per = patches.shape[-1] // 3
            mean = jnp.repeat(jnp.asarray(OPENAI_CLIP_MEAN, jnp.float32), per)
            std = jnp.repeat(jnp.asarray(OPENAI_CLIP_STD, jnp.float32), per)
            patches = (patches.astype(jnp.float32) / 255.0 - mean) / std
        return self.visual(patches, vision_batch["rot_cos"],
                           vision_batch["rot_sin"], vision_batch["seg_window"],
                           vision_batch["seg_full"],
                           vision_batch["reverse_index"])

    def compute_logits(self, hidden):
        if self.cfg.text.tie_word_embeddings:
            emb = self.model.embed_tokens.embedding
            return jnp.einsum("bsd,vd->bsv", hidden,
                              emb.astype(hidden.dtype))
        return self.lm_head(hidden)

    def _embed(self, input_ids, vision_batch, slot_map, vision_embeds=None):
        embeds = self.model.embed_tokens(input_ids)
        vis = vision_embeds
        if vis is None and vision_batch is not None:
            vis = self.encode_images(vision_batch)
        if vis is not None:
            safe = jnp.maximum(slot_map, 0)
            gathered = vis[safe.reshape(-1)].reshape(*slot_map.shape, -1)
            embeds = jnp.where((slot_map >= 0)[..., None],
                               gathered.astype(embeds.dtype), embeds)
        return embeds

    def __call__(self, input_ids, attention_mask=None, positions=None,
                 vision_batch=None, slot_map=None, segment_ids=None,
                 vision_embeds=None, sp_mesh=None):
        """vision_embeds: precomputed (N_tokens, E) table (frozen-tower RL
        update path) — bypasses the vision tower; slot_map indexes into it.
        sp_mesh: Ulysses sequence parallelism (see QwenTextModel)."""
        embeds = self._embed(input_ids, vision_batch, slot_map, vision_embeds)
        hidden = self.model(inputs_embeds=embeds, positions=positions,
                            attention_mask=attention_mask,
                            segment_ids=segment_ids, sp_mesh=sp_mesh)
        return self.compute_logits(hidden), hidden

    def prefill(self, input_ids, attention_mask=None, positions=None,
                vision_batch=None, slot_map=None, last_pos=None):
        """Forward returning per-layer K/V for cache population.
        → (logits, k (layers,B,S,kvh,d), v (layers,B,S,kvh,d)).

        last_pos (B,): compute logits ONLY at these positions → (B, V).
        The engine always passes it — full-sequence logits at a 15k-token
        prompt are a 4.7 GB bf16 buffer and ~17 TF of lm_head the serving
        path never reads. None → full (B, S, V) (tests/back-compat)."""
        embeds = self._embed(input_ids, vision_batch, slot_map)
        hidden, kvs = self.model(inputs_embeds=embeds, positions=positions,
                                 attention_mask=attention_mask,
                                 return_kv=True)
        k = jnp.stack([kv[0] for kv in kvs])
        v = jnp.stack([kv[1] for kv in kvs])
        if last_pos is not None:
            hidden = jnp.take_along_axis(
                hidden, last_pos[:, None, None].astype(jnp.int32), axis=1)
            return self.compute_logits(hidden)[:, 0], k, v
        return self.compute_logits(hidden), k, v

    def decode(self, token_ids, positions, k_cache, v_cache, lengths_incl,
               block_table=None, mesh=None):
        """token_ids (B, 1); → (logits (B, V), k_cache, v_cache)."""
        embeds = self.model.embed_tokens(token_ids)
        hidden, k_cache, v_cache = self.model.decode(
            embeds, positions, k_cache, v_cache, lengths_incl, block_table,
            mesh=mesh)
        return self.compute_logits(hidden)[:, 0], k_cache, v_cache

    def embed_prompt(self, input_ids, vision_batch=None, slot_map=None):
        """Full-prompt embedding table for CHUNKED prefill of multimodal
        prompts: the vision tower runs ONCE here; chunks then slice the
        (1, S, E) embeds (the EVisRAG 15k-token prompts are image-heavy —
        without this, vision prompts would fall back to whole-prompt
        prefill)."""
        return self._embed(input_ids, vision_batch, slot_map)

    def prefill_chunk(self, token_ids, positions, k_cache, v_cache,
                      chunk_rows, gather_rows, start, last_pos=None,
                      inputs_embeds=None):
        """Chunked prefill for ONE prompt (B=1): token_ids (1, C) at
        global positions start..start+C-1, C and start block-aligned;
        chunk_rows (C//bs,) pool rows this chunk writes; gather_rows
        (ceil((start+C)/bs),) rows covering the whole prefix. last_pos (1,)
        → also return logits at that LOCAL chunk position (the final chunk
        samples the first generated token from it); None → logits=None.
        inputs_embeds (1, C, E) overrides token embedding (vision prompts:
        a slice of embed_prompt's table). The engine interleaves these
        dispatches with decode chunks so a 15k-token EVisRAG prompt cannot
        stall running slots for more than one chunk (vLLM chunked-prefill
        role)."""
        embeds = inputs_embeds if inputs_embeds is not None \
            else self.model.embed_tokens(token_ids)
        hidden, k_cache, v_cache = self.model.prefill_chunk(
            embeds, positions, k_cache, v_cache, chunk_rows, gather_rows,
            start)
        logits = None
        if last_pos is not None:
            sel = jnp.take_along_axis(
                hidden, last_pos[:, None, None].astype(jnp.int32), axis=1)
            logits = self.compute_logits(sel)[:, 0]
        return logits, k_cache, v_cache
