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


def sp_flash_attention(q, k, v, *, q_seg=None, kv_seg=None, lengths=None,
                       causal=False, mesh: Mesh = None,
                       backend: str = "ulysses"):
    """GSPMD-callable Ulysses attention: shard_map over the mesh's `seq`
    axis with batch kept on (replica, data) — the integration point that
    lets a model's attention run sequence-parallel inside an ordinary jitted
    train step (the reference wires this via monkey_patch.py:28-67 +
    dp_actor.py:109-116 when ulysses_size > 1).

    q/k/v: GLOBAL (B, S, H, D) arrays (GSPMD reshards to (B/dp, S/n) blocks
    per device); q_seg/kv_seg (B, S) or lengths (B,) are batch-sharded but
    full-sequence. GQA kv heads are repeated up to a multiple of the SP
    degree first (reference flash_attention_utils.py:93-141 repeat_kv).
    Requires S and H divisible by the seq-axis size.

    backend: "ulysses" (all_to_all head sharding — one collective pair,
    needs heads % sp == 0) or "ring" (parallel/ring.py ppermute k/v
    rotation — context parallelism beyond the reference, no head-count
    constraint; k/v repeat to full heads first under GQA)."""
    n = dict(mesh.shape).get(SEQ, 1)
    if n <= 1:
        return flash_attention(q, k, v, q_seg, kv_seg, lengths=lengths,
                               causal=causal)
    b, s, h, d = q.shape
    if s % n:
        raise ValueError(f"seq {s} not divisible by sp={n}; pad first "
                         "(pad_seq_for_ulysses)")
    if lengths is not None and q_seg is None:
        # normalize to segment masks so one shard_map signature serves both
        q_seg = (jnp.arange(s)[None, :] < lengths[:, None]).astype(jnp.int32)
        kv_seg = q_seg
    if q_seg is None:
        q_seg = jnp.ones((b, s), jnp.int32)
        kv_seg = q_seg
    hk = k.shape[2]
    if backend == "ring":
        from .ring import ring_attention
        if hk != h:
            k = jnp.repeat(k, h // hk, axis=2)
            v = jnp.repeat(v, h // hk, axis=2)
        return ring_attention(q, k, v, mesh, causal=causal,
                              segment_ids=q_seg.astype(jnp.int32))
    validate_heads(h, n)
    if hk % n:
        import math
        rep = n // math.gcd(hk, n)
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    BA = ("replica", "data")

    def inner(q, k, v, qs, ks):
        return ulysses_attention(q, k, v, q_seg=qs, kv_seg=ks, causal=causal)

    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(BA, SEQ), P(BA, SEQ), P(BA, SEQ), P(BA, None),
                  P(BA, None)),
        out_specs=P(BA, SEQ), check_vma=False)
    return fn(q, k, v, q_seg, kv_seg)


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
