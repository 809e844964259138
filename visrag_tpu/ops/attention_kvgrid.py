"""Banded segment flash attention with grid-level KV streaming.

The general segment kernel (ops/attention.py `_flash_fwd`) stages the FULL
key sequence per program and scans every K block against every Q block,
masking by segment id. That is the right shape for short packed batches, but
it is catastrophic for the Qwen2.5-VL vision tower's WINDOW attention
(reference modeling_qwen2_5_vl.py:239-260 runs per-window chunks under sdpa;
rsgrpo feeds flash_attn_varlen cu_seqlens): at the EVisRAG serving shape
(3 page images, S≈15.5k packed patches, windows ≤ 64 tokens) the useful
score region is block-diagonal and >95% of the full-scan work is masked out.
Worse, full-sequence K/V staging stops lowering at all at S ≥ ~20k (scoped
VMEM), which is exactly the reference's `limit_mm_per_prompt={"image": 5}`
regime (evisrag/predict.py:112-117).

This kernel exploits the one structural fact the host prep guarantees
(preprocess/qwen_vision.py: `seg = repeat(arange(1, n+1), sizes)`): segment
ids are CONTIGUOUS ascending runs over real tokens, with 0/negative padding
allowed only AFTER the real tokens. Then the K region visible to a Q block is
one contiguous block band, computable exactly from the ids:

  * band bounds (B, num_q_blocks) are computed in plain JAX outside the
    kernel (two tiny reductions + rank-2 comparisons) and fed via scalar
    prefetch;
  * the grid iterates (batch, head, q_block, jj) with jj ranging over a
    STATIC band-width bound — `ceil((block_q + 2*(max_seg_len-1))/block_k)+1`
    blocks when the caller bounds segment length (window layers: 64), or all
    of num_k_blocks when it cannot (per-image full-attention layers, where
    compute is still skipped outside each image's span);
  * K/V/kseg index maps clamp the fetch index into the band, so out-of-band
    grid steps re-request the previous block — Mosaic elides the copy — and
    `pl.when` skips their compute: inactive steps cost neither DMA nor FLOPs;
  * K/V blocks stream per grid step (double-buffered DMA overlapping
    compute), so VMEM holds only one block pair — any sequence length lowers.

VPU economy follows ops/attention_lengths.py: sm_scale·log2(e) folded into
the (bq, d) q tile, base-2 online softmax, no LSE write at inference.

Numerical contract: identical to ops/attention.flash_attention's segment mode
on real (seg > 0) rows. Padding rows differ benignly: rows whose band is
empty come out as exact zeros (full-scan gives them the uniform mean of the
pad K rows); every caller discards pad rows. The LSE residual uses a +LARGE
sentinel on empty rows so the backward's exp(s - lse) underflows to zero
(see attention_lengths._fwd_kernel_grid for why -LARGE would poison grads).

Backward: differentiable via a custom VJP that replays the existing stacked
backward kernels (ops/attention._flash_bwd, full scan). This keeps training
correct wherever the old kernel trained; the banded forward's extra headroom
(S ≥ 20k) is inference-only, which matches every user (the vision tower is
frozen in RL — reference fsdp_workers.py:228-238 — and the retriever trains
the SigLIP tower, not this one).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import (DEFAULT_MASK_VALUE, NUM_LANES, NUM_SUBLANES,
                        _flash_bwd, _round_up, _segment_mask, mha_reference)
from .attention_lengths import LN2, LOG2E, _bwd_block


def _band_bounds(qs, ks, block_q: int, block_k: int):
    """Per-Q-block [start, end) K-block band from contiguous ascending
    segment ids. qs (B, Sq) / ks (B, Sk) int32, real ids > 0, padding
    (0 or negative) only after the real tokens. Returns int32 (B, nq) pairs.

    Relies on klo/khi being non-decreasing over real K blocks (contiguity +
    ascending ids), so `start = #{j : khi[j] < qlo[i]}` and
    `end = #{j : klo[j] <= qhi[i]}` are exact. All-pad K blocks get
    khi = +INF (tail blocks never enter a band); all-pad Q blocks get an
    empty band and the kernel writes zeros.
    """
    INF = jnp.int32(2 ** 30)
    b, sq = qs.shape
    nq, nk = sq // block_q, ks.shape[1] // block_k
    qsb = qs.reshape(b, nq, block_q)
    ksb = ks.reshape(b, nk, block_k)
    qlo = jnp.min(jnp.where(qsb > 0, qsb, INF), axis=2)        # (b, nq)
    qhi = jnp.max(jnp.where(qsb > 0, qsb, 0), axis=2)
    klo = jnp.min(jnp.where(ksb > 0, ksb, INF), axis=2)        # (b, nk)
    khi = jnp.max(jnp.where(ksb > 0, ksb, 0), axis=2)
    khi = jnp.where(khi > 0, khi, INF)
    start = jnp.sum((khi[:, None, :] < qlo[:, :, None]), axis=2)
    end = jnp.sum((klo[:, None, :] <= qhi[:, :, None]), axis=2)
    return start.astype(jnp.int32), end.astype(jnp.int32)


def _fwd_kernel_banded(start_ref, end_ref, qs_ref, ks_ref, q_ref, k_ref,
                       v_ref, o_ref, *rest, sm_scale: float, block_k: int,
                       jgrid: int, with_lse: bool):
    if with_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        lse_ref = None
        acc_ref, m_ref, l_ref = rest
    bq, d = q_ref.shape[-2], q_ref.shape[-1]
    b = pl.program_id(0)
    i = pl.program_id(2)
    jj = pl.program_id(3)

    @pl.when(jj == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    j = start_ref[b, i] + jj

    @pl.when(j < end_ref[b, i])
    def _step():
        # scale (and the base-2 rescale) on the (bq, d) q tile — 1/bk of the
        # score-tile cost
        q = (q_ref[...].reshape(bq, d).astype(jnp.float32)
             * (sm_scale * LOG2E)).astype(q_ref.dtype)
        kb = k_ref[...].reshape(block_k, d)
        vb = v_ref[...].reshape(block_k, d)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # banded blocks straddle many small segments — every step masks
        allow = _segment_mask(qs_ref[0], ks_ref[0, 0:1, :], bq, block_k)
        s = jnp.where(allow, s, DEFAULT_MASK_VALUE)
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_blk = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m_prev - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_prev * corr + jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(jj == jgrid - 1)
    def _epilogue():
        m = m_ref[:, 0:1]
        l = l_ref[:, 0:1]
        l_safe = jnp.maximum(l, 1e-30)
        o_ref[...] = ((acc_ref[...] / l_safe)
                      .astype(o_ref.dtype).reshape(o_ref.shape))
        if with_lse:
            # natural-log lse for the stacked bwd kernels; +LARGE sentinel on
            # empty-band rows (exp(s - lse) → 0, never inf)
            lse = jnp.where(l > 0.0, m * LN2 + jnp.log(l_safe),
                            -DEFAULT_MASK_VALUE)
            lse_ref[0, 0, :, :] = jnp.broadcast_to(lse, (bq, NUM_LANES))


def _banded_fwd(q, k, v, qs_lanes, ks_sub, kstart, kend, sm_scale, block_q,
                block_k, jgrid, need_lse, interpret=False):
    """q/k/v (B, H, S, D) kernel layout, D lane-aligned; qs_lanes
    (B, Sq, 128) / ks_sub (B, 8, Sk) int32; kstart/kend (B, nq) int32."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k

    def kmap(b_, h_, i, jj, start_ref, end_ref):
        # clamp into the band: out-of-band steps re-request the previous
        # block (Mosaic skips the copy); empty bands pin to block 0
        j = start_ref[b_, i] + jj
        jmax = jnp.maximum(end_ref[b_, i] - 1, 0)
        return (b_, h_, jnp.clip(j, 0, jnp.minimum(jmax, nk - 1)), 0)

    def ksegmap(b_, h_, i, jj, start_ref, end_ref):
        j = start_ref[b_, i] + jj
        jmax = jnp.maximum(end_ref[b_, i] - 1, 0)
        return (b_, 0, jnp.clip(j, 0, jnp.minimum(jmax, nk - 1)))

    out_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, jj, *_:
                     (b_, h_, i, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if need_lse:
        out_specs.append(pl.BlockSpec((1, 1, block_q, NUM_LANES),
                                      lambda b_, h_, i, jj, *_:
                                      (b_, h_, i, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((b, h, sq, NUM_LANES), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h, nq, jgrid),
        in_specs=[
            pl.BlockSpec((1, block_q, NUM_LANES),
                         lambda b_, h_, i, jj, *_: (b_, i, 0)),
            pl.BlockSpec((1, NUM_SUBLANES, block_k), ksegmap),
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, i, jj, *_: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), kmap),
            pl.BlockSpec((1, 1, block_k, d), kmap),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_banded, sm_scale=sm_scale,
                          block_k=block_k, jgrid=jgrid, with_lse=need_lse),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(kstart, kend, qs_lanes, ks_sub, q, k, v)
    if need_lse:
        return outs[0], outs[1]
    return outs[0], None


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _kvgrid_core(q, k, v, qs_lanes, ks_sub, kstart, kend, sm_scale, block_q,
                 block_k, jgrid, interpret=False):
    o, _ = _banded_fwd(q, k, v, qs_lanes, ks_sub, kstart, kend, sm_scale,
                       block_q, block_k, jgrid, need_lse=False,
                       interpret=interpret)
    return o


def _kvgrid_core_fwd(q, k, v, qs_lanes, ks_sub, kstart, kend, sm_scale,
                     block_q, block_k, jgrid, interpret=False):
    o, lse = _banded_fwd(q, k, v, qs_lanes, ks_sub, kstart, kend, sm_scale,
                         block_q, block_k, jgrid, need_lse=True,
                         interpret=interpret)
    return o, (q, k, v, qs_lanes, ks_sub, o, lse[..., 0:1])


def _kvgrid_core_bwd(sm_scale, block_q, block_k, jgrid, interpret, res, do):
    # replay the stacked full-scan backward (correct — out-of-band blocks
    # contribute exactly zero); lse residual stored lane-0-compressed
    q, k, v, qs_lanes, ks_sub, o, lse = res
    lse = jnp.broadcast_to(lse, (*lse.shape[:-1], NUM_LANES))
    bq = _bwd_block(q.shape[2], cap=max(block_q, 128))
    bk = _bwd_block(k.shape[2], cap=max(block_k, 128))
    dq, dk, dv = _flash_bwd(q, k, v, qs_lanes, ks_sub, o, lse, do,
                            False, sm_scale, bq, bk, interpret)
    return dq, dk, dv, None, None, None, None


_kvgrid_core.defvjp(_kvgrid_core_fwd, _kvgrid_core_bwd)


def flash_attention_kvgrid(q, k, v, q_seg, kv_seg=None, *, sm_scale=None,
                           max_seg_len=None, block_q=None, block_k=None,
                           interpret=False):
    """Banded segment flash attention, (B, S, H, D) layout, non-causal.

    q_seg/kv_seg (B, S) int32: CONTIGUOUS ascending segment ids over real
    tokens (1, 1, …, 2, 2, …), padding (≤ 0) only after them; a (query, key)
    pair attends iff ids are equal and > 0. max_seg_len (static) bounds the
    token length of any single segment and sizes the kv grid — REQUIRED to be
    an upper bound when given (violations silently truncate attention; the
    vision tower derives it from the same config that built the segments).
    None ⇒ the grid covers the full key range and only the per-block compute
    skip applies (full-attention layers with per-image segments).

    Real rows match flash_attention's segment mode; empty-band (pad) rows
    come out zero. Differentiable (full-scan stacked backward kernels).
    """
    b, sq, h, d = q.shape
    _, sk, hk, dk_ = k.shape
    assert v.shape == k.shape and d == dk_
    if kv_seg is None:
        kv_seg = q_seg
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if jax.default_backend() != "tpu" and not interpret:
        return mha_reference(q, k, v, q_seg.astype(jnp.int32),
                             kv_seg.astype(jnp.int32), causal=False,
                             sm_scale=sm_scale)
    if hk != h:
        assert h % hk == 0
        k = jnp.repeat(k, h // hk, axis=2)
        v = jnp.repeat(v, h // hk, axis=2)

    # block defaults: small bands want small tiles (the k loop is ~3 blocks —
    # per-program prologue no longer amortizes 1024-wide tiles); unbounded
    # bands keep the larger tile for MXU efficiency
    if block_q is None:
        block_q = 256 if (max_seg_len is not None and max_seg_len <= 256) \
            else 512
    if block_k is None:
        block_k = block_q
    bq_ = min(block_q, _round_up(sq, 128))
    bk_ = min(block_k, _round_up(sk, 128))
    sq_p, sk_p = _round_up(sq, bq_), _round_up(sk, bk_)
    d_p = _round_up(d, 128)

    def pad_to(x, s_target, d_target):
        pads = [(0, 0), (0, s_target - x.shape[1]), (0, 0),
                (0, d_target - x.shape[3])]
        return jnp.pad(x, pads) if any(p[1] for p in pads) else x

    qt = jnp.swapaxes(pad_to(q, sq_p, d_p), 1, 2)
    kt = jnp.swapaxes(pad_to(k, sk_p, d_p), 1, 2)
    vt = jnp.swapaxes(pad_to(v, sk_p, d_p), 1, 2)

    qs = jnp.pad(q_seg.astype(jnp.int32), ((0, 0), (0, sq_p - sq)),
                 constant_values=-2)
    ks = jnp.pad(kv_seg.astype(jnp.int32), ((0, 0), (0, sk_p - sk)),
                 constant_values=-1)
    kstart, kend = _band_bounds(qs, ks, bq_, bk_)
    nk = sk_p // bk_
    if max_seg_len is None:
        jgrid = nk
    else:
        jgrid = min(nk, (bq_ + 2 * (max_seg_len - 1) - 1) // bk_ + 2)
    qs_lanes = jnp.broadcast_to(qs[:, :, None], (b, sq_p, NUM_LANES))
    ks_sub = jnp.broadcast_to(ks[:, None, :], (b, NUM_SUBLANES, sk_p))

    o = _kvgrid_core(qt, kt, vt, qs_lanes, ks_sub, kstart, kend, sm_scale,
                     bq_, bk_, jgrid, interpret)
    return jnp.swapaxes(o, 1, 2)[:, :sq, :, :d]
