"""int8 KV cache (Engine cache_dtype="int8" / RolloutConfig.kv_cache_dtype):
per-token/kv-head absmax quantization of the paged pools, dequantized in the
decode kernel via scale folds into the (h, W) matrices. Beyond-reference
perf knob (the reference pins bf16, rollout/config.py:31, but wraps vLLM
whose kv_cache_dtype serves the same role)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visrag_tpu.serving.kv_cache import decode_attention
from visrag_tpu.serving.paged_kv import (KVQuant, paged_decode_attention,
                                         pool_gather, pool_write_rows,
                                         quant_pool_shapes, quantize_kv,
                                         write_prefill, write_token)
from visrag_tpu.serving.sampling import SamplingParams


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(7, 2, 64)) * 3.0, jnp.float32)
    q, sc = quantize_kv(x)
    assert q.dtype == jnp.int8 and sc.shape == (7, 2)
    deq = q.astype(jnp.float32) * sc[..., None]
    # per-row absmax/127 scale → error ≤ scale/2 per element
    err = np.abs(np.asarray(deq - x))
    bound = np.asarray(sc)[..., None] / 2 + 1e-6
    assert (err <= bound).all()
    # zero rows stay exactly zero (scale 1, data 0)
    qz, sz = quantize_kv(jnp.zeros((3, 4)))
    assert np.asarray(sz).tolist() == [1.0, 1.0, 1.0]
    assert not np.asarray(qz).any()


def _quantize_pool(dense, table, bs):
    """Scatter a dense (slots, max_len, kvh, d) cache into a KVQuant pool
    laid out by `table`, via the production write path."""
    slots, max_len, kvh, d = dense.shape
    mb = table.shape[1]
    nb = int(table.max()) + 1
    dsh, ssh = quant_pool_shapes(nb, bs, kvh, d)
    pool = KVQuant(jnp.zeros(dsh, jnp.int8), jnp.zeros(ssh, jnp.float32))
    blocks = jnp.swapaxes(
        dense.reshape(slots, mb, bs, kvh, d), 2, 3).reshape(-1, kvh, bs, d)
    return pool_write_rows(pool, jnp.asarray(table).reshape(-1), blocks)


def _mk_case(seed=0, slots=3, h=8, kvh=2, d=64, bs=128, mb=4):
    rng = np.random.default_rng(seed)
    max_len = bs * mb
    q = jnp.asarray(rng.normal(size=(slots, h, d)), jnp.float32)
    dense_k = jnp.asarray(rng.normal(size=(slots, max_len, kvh, d)),
                          jnp.float32)
    dense_v = jnp.asarray(rng.normal(size=(slots, max_len, kvh, d)),
                          jnp.float32)
    lengths = jnp.asarray([5, 300, 512][:slots], jnp.int32)
    perm = rng.permutation(slots * mb)
    table = np.asarray(perm).reshape(slots, mb).astype(np.int32)
    k_pool = _quantize_pool(dense_k, table, bs)
    v_pool = _quantize_pool(dense_v, table, bs)
    return q, dense_k, dense_v, lengths, jnp.asarray(table), k_pool, v_pool


def test_paged_int8_matches_dequantized_dense():
    """XLA path and interpret kernel on int8 pools == dense attention over
    the DEQUANTIZED values (kernel-correctness, isolated from quant error),
    and ≈ the original f32 values within the quantization budget."""
    q, dk, dv, lengths, table, k_pool, v_pool = _mk_case()
    bs = k_pool.data.shape[2]
    slots, mb = table.shape
    # dequantized dense reference through the same pool
    deq = lambda p: jnp.swapaxes(
        pool_gather(p, table.reshape(-1), jnp.float32).reshape(
            slots, mb, p.data.shape[1], bs, p.data.shape[3]),
        2, 3).reshape(slots, mb * bs, p.data.shape[1], p.data.shape[3])
    want_deq = decode_attention(q, deq(k_pool), deq(v_pool), lengths)
    want_f32 = decode_attention(q, dk, dv, lengths)

    got_xla = paged_decode_attention(q, k_pool, v_pool, table, lengths)
    np.testing.assert_allclose(np.asarray(got_xla), np.asarray(want_deq),
                               rtol=2e-4, atol=2e-4)
    got_kern = paged_decode_attention(q, k_pool, v_pool, table, lengths,
                                      interpret=True)
    # kernel uses bf16 MXU operands → bf16-level tolerance vs dequant ref
    np.testing.assert_allclose(np.asarray(got_kern), np.asarray(want_deq),
                               rtol=2e-2, atol=8e-3)
    # int8 quantization itself stays within ~1% of the f32 attention
    np.testing.assert_allclose(np.asarray(got_xla), np.asarray(want_f32),
                               rtol=5e-2, atol=2e-2)


def test_write_token_and_prefill_int8():
    """write_token / write_prefill quantize in place at the right pool
    coordinates (checked by dequantizing the touched rows)."""
    rng = np.random.default_rng(3)
    slots, kvh, d, bs, mb, L = 2, 2, 64, 128, 2, 3
    nb = slots * mb + 1
    dsh, ssh = quant_pool_shapes(nb, bs, kvh, d)
    mk = lambda: KVQuant(jnp.zeros(dsh, jnp.int8), jnp.zeros(ssh, jnp.float32))
    table = jnp.asarray(rng.permutation(nb - 1).reshape(1, -1)[
        :, :slots * mb].reshape(slots, mb).astype(np.int32))

    # token write at an arbitrary in-block offset
    pool = mk()
    x = jnp.asarray(rng.normal(size=(slots, kvh, d)) * 2, jnp.float32)
    pos = jnp.asarray([5, 130], jnp.int32)
    pool = write_token(pool, table, pos, x)
    for s in range(slots):
        blk = int(table[s, int(pos[s]) // bs])
        row = pool_gather(pool, jnp.asarray([blk]), jnp.float32)[0]
        got = row[:, int(pos[s]) % bs]                      # (kvh, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x[s]),
                                   rtol=2e-2, atol=4e-2)

    # prefill write of a full bucket
    k_pool, v_pool = mk(), mk()
    bucket = bs * mb
    k = jnp.asarray(rng.normal(size=(L, 1, bucket, kvh, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(L, 1, bucket, kvh, d)), jnp.float32)
    kp = tuple(mk() for _ in range(L))
    vp = tuple(mk() for _ in range(L))
    rows = table[0]
    kp, vp = write_prefill(kp, vp, k, v, rows, bucket)
    for layer in range(L):
        got = jnp.swapaxes(pool_gather(kp[layer], rows, jnp.float32),
                           1, 2).reshape(bucket, kvh, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(k[layer, 0]),
                                   rtol=2e-2, atol=2e-2)


def test_paged_int8_tp_shard_map():
    """The TP shard_map path with KVQuant pools (data on kv heads, row-form
    scales on the matching lane span) == the single-device int8 result."""
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh

    mesh = build_mesh(MeshConfig(model=2, data=4))
    q, dk, dv, lengths, table, k_pool, v_pool = _mk_case(seed=11)
    want = paged_decode_attention(q, k_pool, v_pool, table, lengths)
    got = paged_decode_attention(q, k_pool, v_pool, table, lengths,
                                 mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    got_k = paged_decode_attention(q, k_pool, v_pool, table, lengths,
                                   mesh=mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


@pytest.fixture(scope="module")
def tiny_model():
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    ref, cfg = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    model = Qwen25VL(Qwen25VLConfig.tiny())
    return ref, model, params


def test_engine_int8_e2e(tiny_model):
    """An int8-cache engine serves greedy + n-sampled groups (fork block
    copies on KVQuant), survives sleep/wake, and its greedy output matches
    the bf16-cache engine's (the tiny model's logit margins dominate the
    ~1% KV quant noise)."""
    from visrag_tpu.serving.engine import Engine

    _, model, params = tiny_model
    rng = np.random.default_rng(7)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(n,)).astype(
        np.int32)) for n in (6, 11)]
    kw = dict(num_slots=4, max_len=64, prompt_buckets=(16, 32))
    eng8 = Engine(model, params, cache_dtype="int8", **kw)
    assert eng8.kv_quant and isinstance(eng8.k_cache[0], KVQuant)
    eng16 = Engine(model, params, **kw)
    out8 = eng8.generate(prompts, SamplingParams(temperature=0.0,
                                                 max_tokens=6))
    out16 = eng16.generate(prompts, SamplingParams(temperature=0.0,
                                                   max_tokens=6))
    assert out8 == out16

    # n-sampling group: forks share prompt blocks + copy the partial block
    outs = eng8.generate([prompts[0]],
                         SamplingParams(temperature=1.0, max_tokens=4),
                         rng=jax.random.PRNGKey(0), n=2)
    assert len(outs) == 2 and all(len(o) == 4 for o in outs)

    # sleep frees the quantized pools; wake rebuilds the same structure
    eng8.sleep()
    assert eng8.k_cache is None
    eng8.wake()
    assert isinstance(eng8.k_cache[0], KVQuant)
    out8b = eng8.generate(prompts, SamplingParams(temperature=0.0,
                                                  max_tokens=6))
    assert out8b == out8


def test_engine_int8_chunked_prefill(tiny_model):
    """Long prompts through the chunked-prefill path (pool_write_rows /
    pool_gather on KVQuant inside prefill_chunk) match the bf16 engine."""
    from visrag_tpu.serving.engine import Engine

    _, model, params = tiny_model
    rng = np.random.default_rng(9)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(40,)).astype(
        np.int32))]
    kw = dict(num_slots=2, max_len=96, prompt_buckets=(16, 32, 64),
              chunked_prefill_tokens=16)
    out8 = Engine(model, params, cache_dtype="int8", **kw).generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=5))
    out16 = Engine(model, params, **kw).generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=5))
    assert out8 == out16
