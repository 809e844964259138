"""Paged KV cache: block-pool storage + block-table indirection + decode
attention kernel.

The vLLM paged-attention role (reference vllm_rollout_spmd.py:106-127,
SURVEY §2.5). Instead of a dense (layers, slots, max_len, kvh, d) slab,
K/V live in a block POOL (layers, n_blocks, block_size, kvh, d); each slot
owns a list of block ids (host-managed free list). Memory scales with the
tokens actually in flight, not slots × max_len — the dense slab at
Qwen-7B/16k/8-slot scale is ~9 GB of mostly-dead HBM.

The decode read path is a Pallas kernel whose kv grid dimension walks the
BLOCK TABLE via scalar prefetch: block j of slot s maps to pool row
table[s, j], and blocks past the slot's length clamp to the previous row so
Mosaic's revisit logic skips the DMA — decode traffic is O(length), not
O(max_len). Falls back to an XLA gather on CPU (tests) with identical
semantics.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class BlockAllocator:
    """Host-side free-list allocator over the pool's block ids."""

    def __init__(self, n_blocks: int):
        self.free: List[int] = list(range(n_blocks - 1, -1, -1))

    def alloc(self, n: int) -> List[int]:
        if n > len(self.free):
            raise RuntimeError(
                f"KV pool exhausted: need {n} blocks, {len(self.free)} free")
        return [self.free.pop() for _ in range(n)]

    def release(self, blocks: List[int]) -> None:
        self.free.extend(blocks)


def write_prefill(k_pool, v_pool, k, v, rows, bucket: int):
    """Scatter a prompt's K/V into its blocks.

    k/v: (L, 1, bucket, kvh, d) from model.prefill; rows: (bucket//bs,)
    pool block ids. Donated pools → in-place scatter under jit."""
    L = k_pool.shape[0]
    bs = k_pool.shape[2]
    nb = bucket // bs
    kb = k[:, 0].reshape(L, nb, bs, *k.shape[3:]).astype(k_pool.dtype)
    vb = v[:, 0].reshape(L, nb, bs, *v.shape[3:]).astype(v_pool.dtype)
    k_pool = k_pool.at[:, rows].set(kb)
    v_pool = v_pool.at[:, rows].set(vb)
    return k_pool, v_pool


def write_token(pool, layer_idx, table, pos, x):
    """Write one token per slot into pool[layer_idx]: x (slots, kvh, d) at
    logical position pos (slots,) → (table[s, pos//bs], pos%bs)."""
    bs = pool.shape[2]
    blk = jnp.take_along_axis(table, (pos // bs)[:, None], axis=1)[:, 0]
    return pool.at[layer_idx, blk, pos % bs].set(x.astype(pool.dtype))


# ---------------------------------------------------------------------------
# decode attention
# ---------------------------------------------------------------------------


def _xla_paged_decode(q, k_pool, v_pool, table, lengths, sm_scale):
    """Gather-based reference/CPU path; semantics match the kernel."""
    s, h, d = q.shape
    kvh = k_pool.shape[2]
    rep = h // kvh
    bs = k_pool.shape[1]
    kg = k_pool[table]          # (slots, max_blk, bs, kvh, d)
    vg = v_pool[table]
    mb = table.shape[1]
    kg = kg.reshape(s, mb * bs, kvh, d)
    vg = vg.reshape(s, mb * bs, kvh, d)
    qg = q.reshape(s, kvh, rep, d)
    scores = jnp.einsum("sgrd,slgd->sgrl", qg, kg,
                        preferred_element_type=jnp.float32) * sm_scale
    mask = (jnp.arange(mb * bs)[None, :] < lengths[:, None])[:, None, None, :]
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("sgrl,slgd->sgrd", p.astype(vg.dtype), vg,
                   preferred_element_type=jnp.float32)
    return o.reshape(s, h, d).astype(q.dtype)


def _paged_kernel(table_ref, len_ref, q_ref, k_ref, v_ref, o_ref,
                  acc_ref, m_ref, l_ref, *, sm_scale, kvh, rep, block_size):
    s = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    length = len_ref[s]
    h, d = q_ref.shape[1], q_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j * block_size < length)
    def _step():
        q = q_ref[0].astype(jnp.float32) * sm_scale       # (h, d)
        col = j * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (h, block_size), 1)
        ok = col < length
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        # per-kv-group scores: q rows g*rep..(g+1)*rep share kv head g
        srows = []
        for g in range(kvh):
            kb = k_ref[0, :, g, :]                        # (bs, d)
            qg = q[g * rep:(g + 1) * rep]                 # (rep, d)
            srows.append(jax.lax.dot_general(
                qg.astype(jnp.bfloat16), kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        sc = jnp.concatenate(srows, axis=0)               # (h, bs)
        sc = jnp.where(ok, sc, -1e30)
        m_blk = jnp.max(sc, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        p = jnp.exp(sc - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_prev * corr + jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        ords = []
        for g in range(kvh):
            vb = v_ref[0, :, g, :]                        # (bs, d)
            pg = p[g * rep:(g + 1) * rep]                 # (rep, bs)
            ords.append(jax.lax.dot_general(
                pg.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        acc_ref[...] = acc_ref[...] * corr + jnp.concatenate(ords, axis=0)

    @pl.when(j == nj - 1)
    def _epilogue():
        l = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def paged_decode_attention(q, k_pool, v_pool, table, lengths,
                           sm_scale: Optional[float] = None,
                           interpret: bool = False):
    """q (slots, H, d); k_pool/v_pool (n_blocks, block_size, kvh, d);
    table (slots, max_blk) int32 pool rows; lengths (slots,) INCLUDING the
    current token. → (slots, H, d)."""
    s, h, d = q.shape
    nb, bs, kvh, _ = k_pool.shape
    rep = h // kvh
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if jax.default_backend() != "tpu" and not interpret:
        return _xla_paged_decode(q, k_pool, v_pool, table, lengths, sm_scale)

    mb = table.shape[1]
    # clamp beyond-length blocks to the previous valid row: Mosaic's revisit
    # logic skips the DMA for a repeated block index → O(length) traffic
    jj = jnp.arange(mb)[None, :]
    nvalid = jnp.maximum((lengths + bs - 1) // bs, 1)
    table_c = jnp.where(jj < nvalid[:, None], table,
                        jnp.take_along_axis(table, nvalid[:, None] - 1,
                                            axis=1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, mb),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda s_, j, tbl, ln: (s_, 0, 0)),
            pl.BlockSpec((1, bs, kvh, d),
                         lambda s_, j, tbl, ln: (tbl[s_, j], 0, 0, 0)),
            pl.BlockSpec((1, bs, kvh, d),
                         lambda s_, j, tbl, ln: (tbl[s_, j], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda s_, j, tbl, ln: (s_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, d), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_paged_kernel, sm_scale=sm_scale, kvh=kvh, rep=rep,
                          block_size=bs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(table_c, lengths.astype(jnp.int32), q, k_pool, v_pool)
