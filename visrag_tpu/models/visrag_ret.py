"""VisRAG-Ret: page-image dense retriever = MiniCPM-V forward + pooling + L2.

Parity with the reference bi-encoder
(/root/reference/src/openmatch/modeling/dense_retrieval_model.py:142-225 and
modeling_visrag_ret/modeling_visrag_ret.py:86-126): one shared encoder for
queries and pages; hidden states pooled with position-weighted mean ("wmean")
and L2-normalized. Tokenization/slicing happen in preprocess/ (host), not in
forward — the model consumes fixed-shape device batches (EncodeBatch).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pooling import l2_normalize, pool
from .minicpmv import MiniCPMV, MiniCPMVConfig


@dataclasses.dataclass(frozen=True)
class VisRAGRetConfig:
    backbone: MiniCPMVConfig = MiniCPMVConfig()
    pooling: str = "wmean"
    normalize: bool = True
    feature_fp32: bool = True   # pool/normalize in fp32

    @classmethod
    def tiny(cls, **kw):
        defaults = dict(backbone=MiniCPMVConfig.tiny())
        defaults.update(kw)
        return cls(**defaults)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EncodeBatch:
    """Fixed-shape device batch for one encode step (built on host by
    preprocess.pipeline). Text-only batches (queries) carry zero slices with a
    single dummy slice so shapes stay static."""
    input_ids: jax.Array      # (B, S) int32, right-padded
    attention_mask: jax.Array  # (B, S) int32
    patches: jax.Array        # (N, MAX_P, patch_dim) float
    patch_mask: jax.Array     # (N, MAX_P) int32
    pos_matrix: jax.Array     # (N, MAX_P, G²) float32
    grid_h: jax.Array         # (N,) int32
    grid_w: jax.Array         # (N,) int32
    slot_map: jax.Array       # (B, S) int32, -1 = text position


class VisRAGRet(nn.Module):
    cfg: VisRAGRetConfig

    def setup(self):
        self.backbone = MiniCPMV(self.cfg.backbone, name="backbone")

    def __call__(self, batch: EncodeBatch) -> jax.Array:
        """Encode a batch → (B, hidden) L2-normalized embeddings."""
        hidden = self.backbone(
            batch.input_ids, batch.attention_mask, batch.patches,
            batch.patch_mask, batch.pos_matrix, batch.grid_h, batch.grid_w,
            batch.slot_map)
        if self.cfg.feature_fp32:
            hidden = hidden.astype(jnp.float32)
        reps = pool(hidden, batch.attention_mask, self.cfg.pooling)
        if self.cfg.normalize:
            reps = l2_normalize(reps)
        return reps
