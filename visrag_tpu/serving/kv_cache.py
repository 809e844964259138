"""KV-cache decode attention for autoregressive serving.

Replaces the vLLM paged-KV engine role (reference vllm_rollout_spmd.py:106-127,
SURVEY.md §2.5). Slot-contiguous layout: one (L_layers, B_slots, L_max, kvh, d)
buffer pair lives in HBM; sequences occupy slots, continuous batching recycles
slots as sequences finish. Cache WRITES happen inside the models' jitted
decode step on donated buffers (models/*.decode), so each token costs one
in-place scatter — not an O(cache) host-side copy.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def decode_attention(q, k_cache, v_cache, lengths, sm_scale=None):
    """Single-token decode attention against the slot cache.

    q: (slots, H, d) current-step queries;
    k_cache/v_cache: (slots, L_max, kvh, d); lengths: (slots,) valid lengths
    INCLUDING the token written this step.
    Returns (slots, H, d).

    GQA is handled by reshaping q to (slots, kvh, rep, d) — no materialized
    jnp.repeat of the cache. Scores accumulate in fp32 on the MXU from the
    cache dtype (bf16) directly.
    """
    s, h, d = q.shape
    kvh = k_cache.shape[2]
    rep = h // kvh
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    qg = q.reshape(s, kvh, rep, d)
    scores = jnp.einsum("sgrd,slgd->sgrl", qg, k_cache,
                        preferred_element_type=jnp.float32) * sm_scale
    mask = (jnp.arange(k_cache.shape[1])[None, :] <
            lengths[:, None])[:, None, None, :]
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("sgrl,slgd->sgrd", p.astype(v_cache.dtype), v_cache,
                   preferred_element_type=jnp.float32)
    return o.reshape(s, h, d).astype(q.dtype)
