"""Sequence pooling for dense retrieval embeddings.

Behavioral parity with the reference's DRModel.encode pooling modes
(/root/reference/src/openmatch/modeling/dense_retrieval_model.py:142-225):

  wmean     — position-weighted mean: weights = mask * cumsum(mask), i.e. token i
              (1-indexed among valid tokens) gets weight i; the VisRAG-Ret default.
  mean      — plain masked mean.
  lasttoken — hidden state at the last valid position (left- or right-padded).
  cls       — position 0.
  drop_wmean/drop_mean — training-time Dropout1d(0.3) variants (channel dropout
              over the hidden axis applied per (batch, seq) row).

All functions take (B, S, D) hidden states + (B, S) attention mask and return
(B, D). fp32 accumulation regardless of input dtype (the reference upcasts the
mask to float and sums in the model dtype; we sum in fp32 for TPU numerics and
cast back).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def wmean_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    w = (mask * jnp.cumsum(mask, axis=1)).astype(jnp.float32)  # [0,1,1,1,0]→[0,1,2,3,0]
    s = jnp.einsum("bsd,bs->bd", hidden.astype(jnp.float32), w)
    d = jnp.sum(w, axis=1, keepdims=True)
    return (s / d).astype(hidden.dtype)


def mean_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(jnp.float32)
    s = jnp.einsum("bsd,bs->bd", hidden.astype(jnp.float32), m)
    d = jnp.sum(m, axis=1, keepdims=True)
    return (s / d).astype(hidden.dtype)


def last_token_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """Reference last_token_pool (dense_retrieval_model.py:26-34): if the batch is
    left-padded (every row ends valid) take position -1, else take per-row
    sum(mask)-1."""
    left_padded = jnp.sum(mask[:, -1]) == mask.shape[0]
    idx = jnp.where(left_padded,
                    jnp.full((mask.shape[0],), mask.shape[1] - 1, dtype=jnp.int32),
                    jnp.sum(mask, axis=1).astype(jnp.int32) - 1)
    return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0, :]


def cls_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    del mask
    return hidden[:, 0, :]


def _dropout1d(x: jax.Array, key: jax.Array, rate: float) -> jax.Array:
    """torch Dropout1d semantics on (B, S, D): zero entire D-channels... torch's
    Dropout1d on a (B, C, L) tensor drops whole channels C. The reference feeds
    (B, S, D) so S acts as channels: whole token rows are dropped per sample."""
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape[:2])
    return x * keep[:, :, None].astype(x.dtype) / (1.0 - rate)


def pool(hidden: jax.Array, mask: jax.Array, mode: str = "wmean",
         *, is_training: bool = False, rng: Optional[jax.Array] = None) -> jax.Array:
    if mode == "wmean":
        return wmean_pool(hidden, mask)
    if mode == "mean":
        return mean_pool(hidden, mask)
    if mode in ("lasttoken", "simple_lasttoken"):
        if mode == "simple_lasttoken":
            return hidden[:, -1, :]
        return last_token_pool(hidden, mask)
    if mode == "cls":
        return cls_pool(hidden, mask)
    if mode == "drop_wmean":
        w = (mask * jnp.cumsum(mask, axis=1)).astype(jnp.float32)
        h = hidden.astype(jnp.float32) * w[:, :, None]
        if is_training:
            h = _dropout1d(h, rng, 0.3)
        s = jnp.sum(h, axis=1)
        d = jnp.sum(w, axis=1, keepdims=True)
        return (s / d).astype(hidden.dtype)
    if mode == "drop_mean":
        m = mask.astype(jnp.float32)
        h = hidden.astype(jnp.float32) * m[:, :, None]
        if is_training:
            h = _dropout1d(h, rng, 0.3)
        s = jnp.sum(h, axis=1)
        d = jnp.sum(m, axis=1, keepdims=True)
        return (s / d).astype(hidden.dtype)
    raise ValueError(f"unknown pooling mode {mode!r}")


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """F.normalize(dim=-1) parity (clamp-by-eps on the norm)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)
