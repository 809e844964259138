"""Flash attention, valid-length (contiguous right-padding) specialization.

The general kernel in ops/attention.py masks every (q,k) block against segment
ids — necessary for packed sequences, but pure overhead for the dominant case
of right-padded batches (ViT patch buffers, right-padded LM batches: reference
pad(), modeling_minicpmv.py:440-479). This variant takes per-batch valid
lengths via scalar prefetch and:

  * bounds the k-loop at ceil(length/bk) — padded tail blocks are never
    touched (≈20% of ViT work at 950/1152 valid patches);
  * applies masks only on blocks that need them (boundary block, causal
    diagonal crossers) via lax.cond — interior blocks skip the compare/select
    VPU chain entirely (the kernel is VPU-bound, so this is the hot path).

CONTRACT: query rows at positions >= length are NOT zeroed — fully-masked
rows come out as the mean of the in-length V rows (all scores masked to the
same value → uniform softmax). Every caller must mask padded rows downstream
(they all do: pooling masks, loss masks, the proj-GEMM outputs of pad rows
are never read). Valid rows (< length) match ops/attention.mha_reference
with seg = (pos < length) exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import DEFAULT_MASK_VALUE, NUM_LANES, NUM_SUBLANES


def _row_ids(bq, bk, i):
    return i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)


def _col_ids(bq, bk, j):
    return j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)


LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _fwd_kernel_grid(len_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *rest,
                     sm_scale: float, causal: bool,
                     block_q: int, block_k: int, with_lse: bool):
    """Forward kernel with the kv loop as a GRID dimension.

    The original kernel looped kv blocks with an in-kernel fori_loop over
    pl.ds loads, which Mosaic cannot double-buffer — measured 19.7 ms at the
    ViT encode shape (64,16,1152,72→128) vs 13.5 ms for the same math with
    grid-level kv iteration (DMA of block j+1 overlaps compute of block j).
    Running softmax state lives in VMEM scratch across the kv grid steps;
    bf16 operands feed the MXU directly with fp32 accumulation.

    VPU economy (the kernel is VPU-bound at the ViT shapes — every pass over
    the (bq, bk) score tile costs ~2 ms/layer at (116, 16, 1088, 128)):
      * sm_scale·log2(e) is folded into the (bq, d) q tile, not the score
        tile, and the softmax runs in base 2 (exp2 skips exp's internal
        rescale multiply);
      * the length mask is a precomputed per-column BIAS row (0 / -LARGE)
        added in one pass — not iota+compare+select (3 passes) — and only on
        boundary blocks;
      * `with_lse=False` (inference) skips writing the (B, H, S, 128) fp32
        log-sum-exp output entirely (~1 GB of dead HBM writes per ViT layer
        at the encode shape).
    """
    if with_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        lse_ref = None
        acc_ref, m_ref, l_ref = rest
    bq, d = q_ref.shape[-2], q_ref.shape[-1]
    b = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)
    length = len_ref[b]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, DEFAULT_MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    needs_work = j * block_k < length
    if causal:
        needs_work = jnp.logical_and(needs_work,
                                     j * block_k <= (i + 1) * bq - 1)

    @pl.when(needs_work)
    def _step():
        # scale on the (bq, d) q tile — 1/bk of the score-tile cost
        # blocks are (1, 1, bq, d) in the stacked layout or (bq, d) in the
        # flat (M, H*D) layout — reshape normalizes (leading 1s are free)
        q = (q_ref[...].reshape(bq, d).astype(jnp.float32)
             * (sm_scale * LOG2E)).astype(q_ref.dtype)
        kb = k_ref[...].reshape(k_ref.shape[-2], d)
        vb = v_ref[...].reshape(v_ref.shape[-2], d)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

        boundary = (j + 1) * block_k > length
        if causal:
            crosses = (j + 1) * block_k - 1 > i * bq
            needs_mask = jnp.logical_or(boundary, crosses)
        else:
            needs_mask = boundary

        def masked(s):
            s = s + bias_ref[0, 0:1, :]
            if causal:
                allow = (_row_ids(bq, block_k, i)
                         >= _col_ids(bq, block_k, j))
                s = jnp.where(allow, s, DEFAULT_MASK_VALUE)
            return s

        s = jax.lax.cond(needs_mask, masked, lambda s: s, s)
        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_blk = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _epilogue():
        m = m_ref[:, 0:1]
        l = l_ref[:, 0:1]
        l_safe = jnp.maximum(l, 1e-30)
        o_ref[...] = ((acc_ref[...] / l_safe)
                      .astype(o_ref.dtype).reshape(o_ref.shape))
        if with_lse:
            # natural-log lse (bwd uses exp): m is base-2 → rescale by
            # ln 2. Fully-masked (padded) rows get a +LARGE sentinel so the
            # backward pass's exp(s - lse) underflows to exactly 0 — a -LARGE
            # sentinel would overflow to inf on the unmasked fast path and
            # poison parameter grads.
            lse = jnp.where(l > 0.0, m * LN2 + jnp.log(l_safe),
                            -DEFAULT_MASK_VALUE)
            lse_ref[0, 0, :, :] = jnp.broadcast_to(lse, (bq, NUM_LANES))


def _dq_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
               dq_ref, *, sm_scale, causal, block_k, seq_k):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    b = pl.program_id(0)
    i = pl.program_id(2)
    length = len_ref[b]
    q = q_ref[0, 0, :, :].astype(jnp.float32)
    do = do_ref[0, 0, :, :].astype(jnp.float32)
    lse = lse_ref[0, 0, :, 0:1]
    # delta recomputed in-kernel from the o/do tiles: one (bq, d) pass
    # instead of materializing a (B, H, S, 128) fp32 lane-broadcast buffer
    # in HBM (136 MB per layer at the encode shape)
    delta = jnp.sum(o_ref[0, 0, :, :].astype(jnp.float32) * do, axis=1,
                    keepdims=True)
    num_k = pl.cdiv(length, block_k)
    if causal:
        last_q = (i + 1) * bq - 1
        num_k = jnp.minimum(num_k, (last_q // block_k) + 1)

    def body(j, dq):
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        p = jnp.exp(s - lse)

        boundary = (j + 1) * block_k > length
        if causal:
            crosses = (j + 1) * block_k - 1 > i * bq
            needs = jnp.logical_or(boundary, crosses)
        else:
            needs = boundary

        def masked(p):
            allow = _col_ids(bq, block_k, j) < length
            if causal:
                allow = jnp.logical_and(
                    allow, _row_ids(bq, block_k, i) >= _col_ids(bq, block_k, j))
            return jnp.where(allow, p, 0.0)

        p = jax.lax.cond(needs, masked, lambda p: p, p)
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * sm_scale
        return dq + jax.lax.dot_general(ds, kb, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_k, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)


def _dkv_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                dk_ref, dv_ref, *, sm_scale, causal, block_q, seq_q):
    bk, d = k_ref.shape[2], k_ref.shape[3]
    b = pl.program_id(0)
    jblk = pl.program_id(2)
    length = len_ref[b]
    kb = k_ref[0, 0, :, :].astype(jnp.float32)
    vb = v_ref[0, 0, :, :].astype(jnp.float32)
    # q rows beyond `length` have garbage lse but their do is NOT necessarily
    # zero; they must be excluded. q loop bound: valid q rows only.
    num_q = pl.cdiv(length, block_q)
    start_q = (jblk * bk) // block_q if causal else 0

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), 0:1]
        delta = jnp.sum(
            o_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
            * do, axis=1, keepdims=True)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        p = jnp.exp(s - lse)

        k_boundary = (jblk + 1) * bk > length     # this k block has padding
        q_boundary = (i + 1) * block_q > length   # this q block has padding
        if causal:
            crosses = (jblk + 1) * bk - 1 > i * block_q
            needs = k_boundary | q_boundary | crosses
        else:
            needs = k_boundary | q_boundary

        def masked(p):
            allow = jnp.logical_and(
                _col_ids(block_q, bk, jblk) < length,
                _row_ids(block_q, bk, i) < length)
            if causal:
                allow = jnp.logical_and(
                    allow,
                    _row_ids(block_q, bk, i) >= _col_ids(block_q, bk, jblk))
            return jnp.where(allow, p, 0.0)

        p = jax.lax.cond(needs, masked, lambda p: p, p)
        dv_new = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * sm_scale
        ds = jax.lax.cond(needs, masked, lambda x: x, ds)
        dk_new = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        return dk_new, dv_new

    z = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(start_q, num_q, body, (z, z))
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _specs_qkv(block_q, sk, d):
    return [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, *_: (b_, h_, i, 0)),
        pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i, *_: (b_, h_, 0, 0)),
        pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i, *_: (b_, h_, 0, 0)),
    ]


def _length_bias(lengths, sk):
    """(B, NUM_SUBLANES, Sk) fp32 additive mask row: 0 on valid columns,
    -LARGE past each batch row's length (sublane-broadcast for tiling)."""
    cols = jnp.arange(sk, dtype=jnp.int32)[None, :]
    bias = jnp.where(cols < lengths[:, None], 0.0, DEFAULT_MASK_VALUE)
    return jnp.broadcast_to(bias[:, None, :].astype(jnp.float32),
                            (lengths.shape[0], NUM_SUBLANES, sk))


def flash_fwd_lengths(q, k, v, lengths, causal, sm_scale, block_q, block_k,
                      interpret=False, need_lse=True):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, d),
                     lambda b_, h_, i, j, *_: (b_, h_, i, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if need_lse:
        out_specs.append(pl.BlockSpec((1, 1, block_q, NUM_LANES),
                                      lambda b_, h_, i, j, *_: (b_, h_, i, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((b, h, sq, NUM_LANES), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, sq // block_q, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, i, j, *_: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, i, j, *_: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, i, j, *_: (b_, h_, j, 0)),
            pl.BlockSpec((1, NUM_SUBLANES, block_k),
                         lambda b_, h_, i, j, *_: (b_, 0, j)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_grid, sm_scale=sm_scale, causal=causal,
                          block_q=block_q, block_k=block_k, with_lse=need_lse),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(lengths, q, k, v, _length_bias(lengths, sk))
    if need_lse:
        return outs[0], outs[1]
    return outs[0], None


def flash_fwd_lengths_flat(qkv, lengths, n, seq, heads, d, causal, sm_scale,
                           block_q, block_k, interpret=False, need_lse=False):
    """Lengths flash attention reading q/k/v straight out of the FLAT fused
    qkv GEMM output and writing o in the flat layout the output-projection
    GEMM consumes — zero relayouts around the attention:

        qkv: (n*seq, 3*heads*d)   — rows (slice, patch) major, columns
                                     [q_h0 | q_h1 | … | k_h0 | … | v_h(H-1)],
                                     each head a d-lane panel
        →  o: (n*seq, heads*d)

    The block index maps do the (slice, head, patch-block) addressing that
    the stacked layout needs transposes for; the kernel body is the same
    grid kernel as flash_fwd_lengths (rank-normalized refs). With
    need_lse=True the lse comes out in the STACKED (n, h, seq, 128) layout —
    it is only consumed by the stacked backward kernels (flash_flat_core's
    VJP unflattens)."""
    assert qkv.shape == (n * seq, 3 * heads * d)
    pb_q, pb_k = seq // block_q, seq // block_k

    def qspec(t):
        return pl.BlockSpec(
            (block_q if t == 0 else block_k, d),
            lambda b_, h_, i, j, *_, t=t: (
                b_ * (pb_q if t == 0 else pb_k) + (i if t == 0 else j),
                t * heads + h_))

    out_specs = [
        pl.BlockSpec((block_q, d),
                     lambda b_, h_, i, j, *_: (b_ * pb_q + i, h_)),
    ]
    out_shape = [jax.ShapeDtypeStruct((n * seq, heads * d), qkv.dtype)]
    if need_lse:
        out_specs.append(pl.BlockSpec(
            (1, 1, block_q, NUM_LANES),
            lambda b_, h_, i, j, *_: (b_, h_, i, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((n, heads, seq, NUM_LANES), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, heads, pb_q, pb_k),
        in_specs=[
            qspec(0), qspec(1), qspec(2),
            pl.BlockSpec((1, NUM_SUBLANES, block_k),
                         lambda b_, h_, i, j, *_: (b_, 0, j)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_grid, sm_scale=sm_scale, causal=causal,
                          block_q=block_q, block_k=block_k, with_lse=need_lse),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(lengths, qkv, qkv, qkv, _length_bias(lengths, seq))
    if need_lse:
        return outs[0], outs[1]
    return outs[0], None


def flash_bwd_lengths(q, k, v, lengths, o, lse, do, causal, sm_scale,
                      block_q, block_k, interpret=False):
    b, h, sq, d = q.shape
    sk = k.shape[2]

    lm_spec = pl.BlockSpec((1, 1, block_q, NUM_LANES),
                           lambda b_, h_, i, *_: (b_, h_, i, 0))
    qblk = pl.BlockSpec((1, 1, block_q, d),
                        lambda b_, h_, i, *_: (b_, h_, i, 0))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale, causal=causal,
                          block_k=block_k, seq_k=sk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, sq // block_q),
            in_specs=_specs_qkv(block_q, sk, d) + [qblk, qblk, lm_spec],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda b_, h_, i, *_: (b_, h_, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(lengths, q, k, v, o, do, lse)

    full_q = pl.BlockSpec((1, 1, sq, d), lambda b_, h_, j, *_: (b_, h_, 0, 0))
    full_lm = pl.BlockSpec((1, 1, sq, NUM_LANES),
                           lambda b_, h_, j, *_: (b_, h_, 0, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=sm_scale, causal=causal,
                          block_q=block_q, seq_q=sq),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, sk // block_k),
            in_specs=[
                full_q,
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b_, h_, j, *_: (b_, h_, j, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b_, h_, j, *_: (b_, h_, j, 0)),
                full_q, full_q, full_lm,
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b_, h_, j, *_: (b_, h_, j, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b_, h_, j, *_: (b_, h_, j, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(lengths, q, k, v, o, do, lse)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_lengths_core(q, k, v, lengths, causal, sm_scale, block_q, block_k,
                       interpret=False):
    # primal (inference) path: skip the lse output entirely
    o, _ = flash_fwd_lengths(q, k, v, lengths, causal, sm_scale, block_q,
                             block_k, interpret, need_lse=False)
    return o


def _core_fwd(q, k, v, lengths, causal, sm_scale, block_q, block_k,
              interpret=False):
    o, lse = flash_fwd_lengths(q, k, v, lengths, causal, sm_scale, block_q,
                               block_k, interpret)
    # the kernel emits lse LANE-BROADCAST (B, H, S, 128) f32 for tiled
    # reads, but only lane 0 carries data — store the residual compressed
    # (128x smaller: at 16k-token packed RL batches the broadcast form is
    # ~134 MB/layer of saved activations; under remat="mlp" it OOM'd the
    # retriever step). The bwd re-broadcasts before the kernels.
    return o, (q, k, v, lengths, o, lse[..., 0:1])


def _bwd_block(s_padded: int, cap: int = 512) -> int:
    """Largest divisor of the (block-padded) seq len ≤ cap. The bwd kernels
    hold more VMEM residents (full k/v or full q + do + lse/delta) than the
    fwd, so full-sequence fwd blocks OOM there — re-pick smaller tiles.
    Falls back to the largest 8-multiple divisor for bucketed seq lens that
    no 128-multiple divides (e.g. 1088 = 8*136)."""
    for b in (512, 384, 256, 128):
        if b <= cap and s_padded % b == 0:
            return b
    for b in range(min(cap, s_padded), 7, -8):
        if s_padded % b == 0:
            return b
    return s_padded


def _core_bwd(causal, sm_scale, block_q, block_k, interpret, res, do):
    q, k, v, lengths, o, lse = res
    lse = jnp.broadcast_to(lse, (*lse.shape[:-1], NUM_LANES))
    bq = _bwd_block(q.shape[2])
    bk = _bwd_block(k.shape[2])
    dq, dk, dv = flash_bwd_lengths(q, k, v, lengths, o, lse, do, causal,
                                   sm_scale, bq, bk, interpret)
    return dq, dk, dv, None


flash_lengths_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# Flat-layout core: fast transpose-free forward, stacked-kernel backward
# ---------------------------------------------------------------------------


def _flat_to_stacked(qkv, n, seq, heads, d):
    """(n*seq, 3*heads*d) → three (n, heads, seq, d) arrays."""
    parts = qkv.reshape(n, seq, 3, heads, d).transpose(2, 0, 3, 1, 4)
    return parts[0], parts[1], parts[2]


def _stacked_to_flat(dq, dk, dv, n, seq, heads, d):
    """Three (n, heads, seq, d) grads → (n*seq, 3*heads*d)."""
    g = jnp.stack([dq, dk, dv])                       # (3, n, h, seq, d)
    return g.transpose(1, 3, 0, 2, 4).reshape(n * seq, 3 * heads * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9,
                                                    10))
def flash_flat_core(qkv, lengths, n, seq, heads, d, causal, sm_scale,
                    block_q, block_k, interpret=False):
    """Differentiable flat-layout lengths flash attention. The forward is
    the transpose-free flat kernel (the hot inference path — no lse, no
    relayouts); the backward unflattens once and reuses the stacked dq/dkv
    kernels, so training pays the transposes only where grads flow."""
    o, _ = flash_fwd_lengths_flat(qkv, lengths, n, seq, heads, d, causal,
                                  sm_scale, block_q, block_k, interpret,
                                  need_lse=False)
    return o


def _flat_fwd(qkv, lengths, n, seq, heads, d, causal, sm_scale, block_q,
              block_k, interpret=False):
    o, lse = flash_fwd_lengths_flat(qkv, lengths, n, seq, heads, d, causal,
                                    sm_scale, block_q, block_k, interpret,
                                    need_lse=True)
    return o, (qkv, lengths, o, lse[..., 0:1])   # see _core_fwd


def _flat_bwd(n, seq, heads, d, causal, sm_scale, block_q, block_k,
              interpret, res, do):
    qkv, lengths, o, lse = res
    lse = jnp.broadcast_to(lse, (*lse.shape[:-1], NUM_LANES))
    q, k, v = _flat_to_stacked(qkv, n, seq, heads, d)
    o4 = jnp.swapaxes(o.reshape(n, seq, heads, d), 1, 2)
    do4 = jnp.swapaxes(do.reshape(n, seq, heads, d), 1, 2)
    bq = _bwd_block(seq)
    bk = _bwd_block(seq)
    dq, dk, dv = flash_bwd_lengths(q, k, v, lengths, o4, lse, do4, causal,
                                   sm_scale, bq, bk, interpret)
    return _stacked_to_flat(dq, dk, dv, n, seq, heads, d), None


flash_flat_core.defvjp(_flat_fwd, _flat_bwd)
