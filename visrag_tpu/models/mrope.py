"""Qwen2.5-VL 3-D multimodal RoPE (mrope) utilities.

Host-side position-id computation matching the reference's patched
get_rope_index (/root/reference/src/rsgrpo/verl/models/transformers/
qwen2_vl.py:47-149, itself the HF Qwen2.5-VL algorithm): text tokens advance
all three (t, h, w) streams together; each image's tokens get constant t and a
(h, w) grid in *merged* (LLM) resolution; after a segment the running offset
jumps to max(position)+1.

Device-side application matching HF apply_multimodal_rotary_pos_emb
(transformers qwen2_5_vl): the head_dim/2 frequency channels are partitioned
into mrope_section = [t, h, w] chunks, each driven by its own position stream.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_rope_index(input_ids: np.ndarray, image_grid_thw: Sequence[Tuple[int, int, int]],
                   image_token_id: int, spatial_merge_size: int = 2,
                   attention_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """(S,) ids for ONE sequence → (3, S) t/h/w position ids.

    image_grid_thw: per image (t, h, w) in ViT-patch units (pre-merge); the
    i-th run of image_token_id consumes t*(h/m)*(w/m) tokens.
    """
    s = len(input_ids)
    pos = np.zeros((3, s), np.int64)
    m = spatial_merge_size
    img_idx = 0
    st = 0
    offset = 0
    i = 0
    while i < s:
        if input_ids[i] == image_token_id:
            t, h, w = image_grid_thw[img_idx]
            lh, lw = h // m, w // m
            n = t * lh * lw
            tt = np.repeat(np.arange(t), lh * lw)
            hh = np.tile(np.repeat(np.arange(lh), lw), t)
            ww = np.tile(np.arange(lw), t * lh)
            pos[0, i:i + n] = offset + tt
            pos[1, i:i + n] = offset + hh
            pos[2, i:i + n] = offset + ww
            offset = pos[:, i:i + n].max() + 1
            i += n
            img_idx += 1
        else:
            pos[:, i] = offset
            offset += 1
            i += 1
    if attention_mask is not None:
        pos[:, attention_mask == 0] = 1  # HF sets masked positions to 1
    return pos


def mrope_cos_sin(positions: jax.Array, inv_freq: jax.Array,
                  mrope_section: Sequence[int]) -> Tuple[jax.Array, jax.Array]:
    """positions (3, B, S) → cos/sin (B, S, head_dim) with sections
    interleaved per HF apply_multimodal_rotary_pos_emb.

    inv_freq: (head_dim/2,). mrope_section sums to head_dim/2.
    """
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (3,B,S,hd/2)
    sections = list(mrope_section)
    starts = np.cumsum([0] + sections)
    parts = [freqs[i % 3, :, :, starts[i]:starts[i + 1]]
             for i in range(len(sections))]
    half = jnp.concatenate(parts, axis=-1)                       # (B,S,hd/2)
    emb = jnp.concatenate([half, half], axis=-1)                  # (B,S,hd)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope_cos_sin(q: jax.Array, k: jax.Array, cos: jax.Array,
                       sin: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """q,k (B, S, H, D); cos/sin (B, S, D). fp32 rotation."""
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)

    def rot(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    return ((qf * cos + rot(qf) * sin).astype(q.dtype),
            (kf * cos + rot(kf) * sin).astype(k.dtype))
