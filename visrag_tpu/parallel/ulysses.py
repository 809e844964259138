"""Ulysses-style sequence parallelism: all_to_all seq↔heads around attention.

Replaces the reference's torch.distributed SP stack
(/root/reference/src/rsgrpo/verl/utils/ulysses.py:63-235 SeqAllToAll /
gather_seq_scatter_heads, models/transformers/flash_attention_utils.py:93-141)
with `jax.lax.all_to_all` inside shard_map over the mesh's `seq` axis —
gradients flow through the collective automatically (no hand-written autograd
Function), and XLA schedules the transfers on ICI.

Layout contract: inputs arrive sequence-sharded (B, S/n, H, D) per device;
attention runs head-sharded (B, S, H/n, D); outputs return sequence-sharded.
Head count must divide the seq-axis size (reference validate check
ulysses.py:323-327).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..mesh import SEQ
from ..ops.attention import flash_attention


def seq_to_heads(x: jax.Array, axis_name: str = SEQ) -> jax.Array:
    """(B, S/n, H, D) → (B, S, H/n, D) via all_to_all."""
    return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                              tiled=True)


def heads_to_seq(x: jax.Array, axis_name: str = SEQ) -> jax.Array:
    """(B, S, H/n, D) → (B, S/n, H, D)."""
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def ulysses_attention(q, k, v, *, q_seg=None, kv_seg=None, lengths=None,
                      causal=False, axis_name: str = SEQ, **kw):
    """Sequence-parallel flash attention (call inside shard_map with `seq`).

    q/k/v: (B, S/n, H, D) local shards; segment ids / lengths must be
    REPLICATED full-sequence values ((B, S) / (B,)) — they are cheap and
    avoiding their resharding keeps the collectives to the 3 qkv + 1 output
    all_to_alls, like the reference (flash_attention_utils.py:93-101).
    """
    qh = seq_to_heads(q, axis_name)
    kh = seq_to_heads(k, axis_name)
    vh = seq_to_heads(v, axis_name)
    o = flash_attention(qh, kh, vh, q_seg, kv_seg, lengths=lengths,
                        causal=causal, **kw)
    return heads_to_seq(o, axis_name)


def pad_seq_for_ulysses(x: jax.Array, seq_size: int, axis: int = 1):
    """Pad the sequence axis to a multiple of the SP degree
    (ulysses_pad_and_slice_inputs role, reference ulysses.py:273-320)."""
    s = x.shape[axis]
    pad = (-s) % seq_size
    if pad == 0:
        return x, s
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), s


def validate_heads(num_heads: int, sp_size: int):
    if num_heads % sp_size != 0:
        raise ValueError(f"{num_heads} heads not divisible by sp={sp_size} "
                         "(reference ulysses.py:323-327)")
