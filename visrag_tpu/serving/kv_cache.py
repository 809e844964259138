"""KV cache for autoregressive serving.

Replaces the vLLM paged-KV engine role (reference vllm_rollout_spmd.py:106-127,
SURVEY.md §2.5). Slot-contiguous layout: one (L_layers, B_slots, L_max, kvh, d)
buffer pair lives in HBM; sequences occupy slots, continuous batching recycles
slots as sequences finish. Page-table indirection can be layered underneath
without touching the attention math (the decode reads are identical bytes).

All updates are functional (donated buffers under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    k: jax.Array   # (layers, slots, max_len, kv_heads, head_dim)
    v: jax.Array
    # per-slot current length (== next write position)
    lengths: jax.Array  # (slots,) int32

    @staticmethod
    def create(layers: int, slots: int, max_len: int, kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (layers, slots, max_len, kv_heads, head_dim)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                       lengths=jnp.zeros((slots,), jnp.int32))

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def write_prefill(self, layer: int, slot, k_new, v_new, start=0):
        """Write a (S, kvh, d) prompt chunk for one slot at `start`."""
        k = jax.lax.dynamic_update_slice(
            self.k, k_new[None, None].astype(self.k.dtype),
            (layer, slot, start, 0, 0))
        v = jax.lax.dynamic_update_slice(
            self.v, v_new[None, None].astype(self.v.dtype),
            (layer, slot, start, 0, 0))
        return dataclasses.replace(self, k=k, v=v)

    def write_decode(self, layer: int, k_new, v_new):
        """Write one token per slot: k_new (slots, kvh, d) at each slot's
        current length."""
        slots = self.k.shape[1]
        idx = jnp.arange(slots)
        k = self.k.at[layer, idx, self.lengths].set(k_new.astype(self.k.dtype))
        v = self.v.at[layer, idx, self.lengths].set(v_new.astype(self.v.dtype))
        return dataclasses.replace(self, k=k, v=v)

    def bump(self, active) -> "KVCache":
        """Advance lengths for active slots (after all layers wrote)."""
        return dataclasses.replace(
            self, lengths=self.lengths + active.astype(jnp.int32))


def decode_attention(q, k_cache, v_cache, lengths, sm_scale=None):
    """Single-token decode attention against the slot cache.

    q: (slots, H, d) current-step queries;
    k_cache/v_cache: (slots, L_max, kvh, d); lengths: (slots,) valid lengths
    INCLUDING the token written this step.
    Returns (slots, H, d). fp32 softmax.
    """
    import math
    s, h, d = q.shape
    kvh = k_cache.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if kvh != h:
        rep = h // kvh
        k_cache = jnp.repeat(k_cache, rep, axis=2)
        v_cache = jnp.repeat(v_cache, rep, axis=2)
    scores = jnp.einsum("shd,slhd->shl", q.astype(jnp.float32),
                        k_cache.astype(jnp.float32)) * sm_scale
    mask = jnp.arange(k_cache.shape[1])[None, None, :] < lengths[:, None, None]
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("shl,slhd->shd", p, v_cache.astype(jnp.float32)).astype(q.dtype)
