"""MiniCPM-V 2.6: SigLIP-SO400M vision tower + perceiver resampler + Qwen2-7B.

The reference's VisRAG-Gen evaluates with this model as a backend
(visrag_scripts/generate/generate.py:28 choices=['MiniCPM','MiniCPMV2.0',
'MiniCPMV2.6','gpt4o'], :243-267) but carries no in-tree modeling for it —
it loads HF remote code from the released openbmb/MiniCPM-V-2_6 checkpoint.
This module is the TPU-native composite built from the already-parity-tested
towers:

  * vpm        — our static-shape SiglipViT at the 2.6 geometry (full 27
                 blocks, 70×70 native pos grid from the 980px image size;
                 the checkpoint stores it as an HF SiglipVisionModel —
                 hf_loader.convert_minicpmv26 maps that layout);
  * resampler  — the shared perceiver resampler with query_pos=False (the
                 2.6 resampler drops the fixed query-side sincos buffer and
                 keeps only the adaptive key-side pos embed);
  * llm        — QwenTextModel (Qwen2-7B: untied lm_head, GQA 28q/4kv,
                 rope theta 1e6). Plain 1-D RoPE: the engine's (3, B, S)
                 mrope position streams carry identical rows for text-only
                 models, under which mrope reduces exactly to RoPE for any
                 section split.

Engine contract identical to Qwen25VL/MiniCPMVForGeneration: __call__ /
prefill / decode, cfg.text for cache shapes, vision via an EncodeBatch-style
dict + slot map (slices from ALL images in one prompt are batched into one
vision forward; the slot map scatters both <image> and <slice> regions —
preprocess.tokenize.vision_bounds).

Known cost: the host-built pos resample matrices are (P, 70²=4900) at this
grid — ~23 MB fp32 per slice (6.7× the 2.0 27-grid). Generation batches are
small so this is tolerable; if 2.6 ever becomes an encode-throughput path,
port it to the device-mode factorized pos operators
(preprocess/device.finish_encode_batch) like the 2.0 encode pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import Dense
from .qwen25_vl import QwenTextConfig, QwenTextModel
from .resampler import Resampler, ResamplerConfig
from .siglip_vit import SiglipViT, SiglipViTConfig


def _qwen2_7b() -> QwenTextConfig:
    return QwenTextConfig(
        vocab_size=151666, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        rope_theta=1_000_000.0, tie_word_embeddings=False,
        mrope_section=(16, 24, 24))


@dataclasses.dataclass(frozen=True)
class MiniCPMV26Config:
    vit: SiglipViTConfig = SiglipViTConfig(depth=27, pos_grid=70, act="tanh")
    resampler: ResamplerConfig = ResamplerConfig(
        embed_dim=3584, kv_dim=1152, num_heads=28, query_pos=False)
    llm: QwenTextConfig = dataclasses.field(default_factory=_qwen2_7b)
    query_num: int = 64
    slice_mode: bool = True
    max_slice_nums: int = 9
    scale_resolution: int = 448
    patch_size: int = 14

    @property
    def text(self):
        """Engine cache-shape contract (serving.engine reads cfg.text)."""
        return self.llm

    @classmethod
    def tiny(cls, **kw):
        # vocab ≥ 256: MockTokenizer byte ids reach 250 (QwenTextConfig.tiny
        # defaults to 128, which silently gathers out-of-range → non-finite)
        llm = QwenTextConfig.tiny(tie_word_embeddings=False, vocab_size=512)
        vit = SiglipViTConfig.tiny(act="tanh")
        res = ResamplerConfig.tiny(num_queries=4, embed_dim=llm.hidden_size,
                                   kv_dim=vit.embed_dim, num_heads=2,
                                   query_pos=False)
        d = dict(vit=vit, resampler=res, llm=llm, query_num=4)
        d.update(kw)
        return cls(**d)


class MiniCPMV26ForGeneration(nn.Module):
    cfg: MiniCPMV26Config

    def setup(self):
        self.vpm = SiglipViT(self.cfg.vit, name="vpm")
        self.resampler_mod = Resampler(self.cfg.resampler, name="resampler")
        self.model = QwenTextModel(self.cfg.llm, name="model")
        c = self.cfg.llm
        self.lm_head = Dense(c.hidden_size, c.vocab_size, use_bias=False,
                             dtype=c.dtype, name="lm_head")

    def get_vision_embedding(self, patches, patch_mask, pos_matrix,
                             grid_h, grid_w):
        """(N_slices, MAX_P, patch_dim) → (N_slices, query_num, hidden)."""
        feats = self.vpm(patches, patch_mask, pos_matrix)
        return self.resampler_mod(feats, grid_h, grid_w, patch_mask)

    def _logits(self, hidden):
        return self.lm_head(hidden)

    def _embed(self, input_ids, vision_batch, slot_map):
        tok = self.model.embed_tokens(input_ids)
        if vision_batch is None:
            return tok
        if "pixels" in vision_batch:
            # raw device-mode batch (uint8 pixels, no pos arrays): finish
            # normalization + pos operators in-jit — at the 70² grid the
            # host dense pos matrices are ~23 MB/slice, so generation
            # batches ship pixels only (build_multi_image_batch
            # device_mode=True)
            from ..preprocess.device import (cached_bicubic_table,
                                             finish_vision_batch)
            vision_batch = finish_vision_batch(
                vision_batch, cached_bicubic_table(self.cfg.vit.pos_grid))
        vision = self.get_vision_embedding(
            vision_batch["patches"], vision_batch["patch_mask"],
            vision_batch["pos_matrix"], vision_batch["grid_h"],
            vision_batch["grid_w"])
        flat = vision.reshape(-1, vision.shape[-1])
        safe = jnp.maximum(slot_map, 0)
        vis = flat[safe.reshape(-1)].reshape(*slot_map.shape, -1)
        return jnp.where((slot_map >= 0)[..., None], vis.astype(tok.dtype),
                         tok)

    def __call__(self, input_ids, attention_mask=None, positions=None,
                 vision_batch=None, slot_map=None):
        embeds = self._embed(input_ids, vision_batch, slot_map)
        hidden = self.model(inputs_embeds=embeds,
                            attention_mask=attention_mask,
                            positions=positions)
        return self._logits(hidden), hidden

    def prefill(self, input_ids, attention_mask=None, positions=None,
                vision_batch=None, slot_map=None, last_pos=None):
        embeds = self._embed(input_ids, vision_batch, slot_map)
        hidden, kvs = self.model(inputs_embeds=embeds,
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
        embeds = self.model.embed_tokens(token_ids)
        hidden, k_cache, v_cache = self.model.decode(
            embeds, positions, k_cache, v_cache, lengths_incl, block_table,
            mesh=mesh)
        return self._logits(hidden)[:, 0], k_cache, v_cache
