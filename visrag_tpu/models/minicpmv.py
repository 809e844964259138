"""MiniCPM-V 2.0 composite: SigLIP ViT tower + resampler + MiniCPM-2B LM.

Parity with /root/reference/src/openmatch/modeling/modeling_minicpmv/
modeling_minicpmv.py:
  * get_vision_embedding (:95-122): every slice → ViT forward_features →
    resampler(tgt_size = ceil(H/14), ceil(W/14)) → 64 tokens each;
  * get_vllm_embedding (:124-171): token embeds * scale_emb, then vision
    tokens scattered into the [im_start+1, im_end) positions;
  * dummy-grad tie-in for batches without images (:167-168) is unnecessary in
    JAX (unused params simply get zero grads).

TPU-first: the reference loops per sample and per slice (dynamic shapes); here
ALL slices of ALL pages in the batch run as one static (TOTAL_SLICES, MAX_P)
ViT+resampler call, and the scatter is a vectorized gather via a host-built
slot map — no per-sample Python under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .minicpm import MiniCPMConfig, MiniCPMModel
from .resampler import Resampler, ResamplerConfig
from .siglip_vit import SiglipViT, SiglipViTConfig


@dataclasses.dataclass(frozen=True)
class MiniCPMVConfig:
    llm: MiniCPMConfig = MiniCPMConfig()
    vit: SiglipViTConfig = SiglipViTConfig()
    resampler: ResamplerConfig = ResamplerConfig()
    query_num: int = 64
    slice_mode: bool = True
    max_slice_nums: int = 9
    scale_resolution: int = 448
    patch_size: int = 14

    @classmethod
    def tiny(cls, **kw):
        llm = MiniCPMConfig.tiny()
        vit = SiglipViTConfig.tiny()
        res = ResamplerConfig.tiny(num_queries=4, embed_dim=llm.hidden_size,
                                   kv_dim=vit.embed_dim, num_heads=2)
        defaults = dict(llm=llm, vit=vit, resampler=res, query_num=4)
        defaults.update(kw)
        return cls(**defaults)


class MiniCPMV(nn.Module):
    cfg: MiniCPMVConfig

    def setup(self):
        self.vpm = SiglipViT(self.cfg.vit, name="vpm")
        self.resampler_mod = Resampler(self.cfg.resampler, name="resampler")
        self.llm = MiniCPMModel(self.cfg.llm, name="llm")

    def get_vision_embedding(self, patches, patch_mask, pos_matrix,
                             grid_h, grid_w):
        """(N_slices, MAX_P, patch_dim) → (N_slices, query_num, hidden)."""
        feats = self.vpm(patches, patch_mask, pos_matrix)
        return self.resampler_mod(feats, grid_h, grid_w, patch_mask)

    def __call__(self, input_ids, attention_mask, patches, patch_mask,
                 pos_matrix, grid_h, grid_w, slot_map, positions=None):
        """Full page forward → last hidden states.

        input_ids:  (B, S) right-padded token ids.
        patches:    (N, MAX_P, patch_dim) all slices in the batch, flattened.
        patch_mask: (N, MAX_P); pos_matrix: (N, MAX_P, G²); grid_h/w: (N,).
        slot_map:   (B, S) int32: flat vision-token index (slice*query_num+q)
                    for positions inside <image>…</image> bounds, else -1.
        """
        c = self.cfg
        vision = self.get_vision_embedding(patches, patch_mask, pos_matrix,
                                           grid_h, grid_w)
        vision_flat = vision.reshape(-1, vision.shape[-1])

        tok = self.llm.embed_only(input_ids)                   # * scale_emb
        safe = jnp.maximum(slot_map, 0)
        vis = vision_flat[safe.reshape(-1)].reshape(*slot_map.shape, -1)
        embeds = jnp.where((slot_map >= 0)[..., None], vis.astype(tok.dtype), tok)

        hidden = self.llm(inputs_embeds=embeds, attention_mask=attention_mask,
                          positions=positions)
        return hidden


@dataclasses.dataclass(frozen=True)
class MiniCPMVGenConfig:
    backbone: MiniCPMVConfig = MiniCPMVConfig()

    @property
    def text(self):
        """Engine cache-shape contract (serving.engine reads cfg.text)."""
        return self.backbone.llm

    @classmethod
    def tiny(cls, **kw):
        d = dict(backbone=MiniCPMVConfig.tiny())
        d.update(kw)
        return cls(**d)


class MiniCPMVForGeneration(nn.Module):
    """MiniCPM-V with lm_head + serving prefill/decode — the VisRAG-Gen
    generator (reference MiniCPMV.generate/chat, modeling_minicpmv.py:218-398)
    run on the TPU serving engine instead of HF generate.

    Vision inputs arrive via the same EncodeBatch-style dict as VisRAG-Ret
    (vision_batch = {patches, patch_mask, pos_matrix, grid_h, grid_w}) with a
    slot map; mrope-style (3, B, S) positions from the engine collapse to the
    1-D stream (MiniCPM uses standard RoPE)."""
    cfg: MiniCPMVGenConfig

    def setup(self):
        self.backbone = MiniCPMV(self.cfg.backbone, name="backbone")
        c = self.cfg.backbone.llm
        from .common import Dense
        self.lm_head = Dense(c.hidden_size, c.vocab_size, use_bias=False,
                             dtype=c.dtype, name="lm_head")

    def _logits(self, hidden):
        c = self.cfg.backbone.llm
        return self.lm_head(hidden / (c.hidden_size / c.dim_model_base))

    def _embed(self, input_ids, vision_batch, slot_map):
        tok = self.backbone.llm.embed_only(input_ids)
        if vision_batch is None:
            return tok
        vision = self.backbone.get_vision_embedding(
            vision_batch["patches"], vision_batch["patch_mask"],
            vision_batch["pos_matrix"], vision_batch["grid_h"],
            vision_batch["grid_w"])
        flat = vision.reshape(-1, vision.shape[-1])
        safe = jnp.maximum(slot_map, 0)
        vis = flat[safe.reshape(-1)].reshape(*slot_map.shape, -1)
        return jnp.where((slot_map >= 0)[..., None], vis.astype(tok.dtype), tok)

    def __call__(self, input_ids, attention_mask=None, positions=None,
                 vision_batch=None, slot_map=None):
        embeds = self._embed(input_ids, vision_batch, slot_map)
        if positions is not None and positions.ndim == 3:
            positions = positions[0]
        hidden = self.backbone.llm(inputs_embeds=embeds,
                                   attention_mask=attention_mask,
                                   positions=positions)
        return self._logits(hidden), hidden

    def prefill(self, input_ids, attention_mask=None, positions=None,
                vision_batch=None, slot_map=None, last_pos=None):
        embeds = self._embed(input_ids, vision_batch, slot_map)
        if positions is not None and positions.ndim == 3:
            positions = positions[0]
        hidden, kvs = self.backbone.llm(inputs_embeds=embeds,
                                        attention_mask=attention_mask,
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
        embeds = self.backbone.llm.embed_only(token_ids)
        if positions.ndim == 3:
            positions = positions[0]
        hidden, k_cache, v_cache = self.backbone.llm.decode(
            embeds, positions, k_cache, v_cache, lengths_incl, block_table,
            mesh=mesh)
        return self._logits(hidden)[:, 0], k_cache, v_cache
