"""Serving engine: KV-cache decode parity with full forward, greedy match vs
HF generate, continuous batching bookkeeping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
from visrag_tpu.serving.engine import Engine
from visrag_tpu.serving.sampling import SamplingParams, sample


@pytest.fixture(scope="module")
def tiny_model():
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    ref, cfg = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    model = Qwen25VL(Qwen25VLConfig.tiny())
    return ref, model, params


def test_decode_matches_full_forward(tiny_model):
    """Incremental decode logits == full-forward logits at each position."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, size=(1, 8)).astype(np.int32)

    full_logits, _ = model.apply(params, jnp.asarray(ids))
    full_logits = np.asarray(full_logits)

    # prefill first 5 tokens, then decode 3 more
    pre = ids[:, :5]
    pos = np.broadcast_to(np.arange(5), (3, 1, 5))
    logits, k, v = model.apply(params, jnp.asarray(pre),
                               positions=jnp.asarray(pos),
                               method=model.prefill)
    np.testing.assert_allclose(np.asarray(logits)[0], full_logits[0, :5],
                               rtol=2e-4, atol=2e-4)

    layers = k.shape[0]
    max_len = 16
    kc0 = np.zeros((layers, 1, max_len) + k.shape[3:], np.float32)
    vc0 = np.zeros_like(kc0)
    kc0[:, :, :5] = np.asarray(k)
    vc0[:, :, :5] = np.asarray(v)
    # caches are per-layer tuples (see paged_kv.pool_shape)
    kc = tuple(jnp.asarray(kc0[i]) for i in range(layers))
    vc = tuple(jnp.asarray(vc0[i]) for i in range(layers))
    length = 5
    for t in range(5, 8):
        tok = ids[:, t:t + 1]
        pos_t = np.full((3, 1, 1), t, np.int32)
        # decode writes this token's K/V into the full cache stack itself
        lg, kc, vc = model.apply(params, jnp.asarray(tok),
                                 jnp.asarray(pos_t), kc, vc,
                                 jnp.asarray([length + 1], jnp.int32),
                                 method=model.decode)
        np.testing.assert_allclose(np.asarray(lg)[0], full_logits[0, t],
                                   rtol=3e-4, atol=3e-4)
        length += 1


def test_engine_greedy_matches_hf(tiny_model):
    import torch
    ref, model, params = tiny_model
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 100, size=(6,)).astype(np.int32)
    with torch.no_grad():
        out = ref.generate(torch.tensor(prompt[None].astype(np.int64)),
                           max_new_tokens=6, do_sample=False)
    want = out[0, 6:].numpy().tolist()

    eng = Engine(model, params, num_slots=2, max_len=64,
                 prompt_buckets=(16, 32))
    outs = eng.generate(
        [dict(input_ids=prompt)],
        sampling=SamplingParams(temperature=0.0, max_tokens=6))
    assert outs[0] == want


def test_engine_continuous_batching(tiny_model):
    """More requests than slots; all complete with correct lengths."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(2)
    eng = Engine(model, params, num_slots=2, max_len=64,
                 prompt_buckets=(16,))
    prompts = [dict(input_ids=rng.integers(0, 100, size=(n,)).astype(np.int32))
               for n in (4, 7, 5, 9, 3)]
    outs = eng.generate(prompts, sampling=SamplingParams(temperature=0.0,
                                                         max_tokens=4))
    assert len(outs) == 5
    assert all(len(o) == 4 for o in outs)
    # determinism: same prompt twice → same continuation
    eng2 = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,))
    outs2 = eng2.generate([prompts[0], prompts[0]],
                          sampling=SamplingParams(temperature=0.0, max_tokens=4))
    assert outs2[0] == outs2[1]


def test_sampling_top_p_and_penalty():
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray([[0.0, 1.0, 2.0, 10.0]])
    # top_p tiny → only argmax survives
    p = SamplingParams(temperature=1.0, top_p=0.1)
    tok = sample(logits, rng, p)
    assert int(tok[0]) == 3
    # repetition penalty pushes down a seen dominant token
    seen = jnp.asarray([[False, False, False, True]])
    p2 = SamplingParams(temperature=0.0, repetition_penalty=100.0)
    tok2 = sample(jnp.asarray([[2.0, 1.9, 0.0, 2.05]]), rng, p2, seen)
    assert int(tok2[0]) == 0


def test_minicpmv_generation_engine():
    """MiniCPM-V serving path: decode == full forward; engine generates with a
    page image in the prompt."""
    from PIL import Image
    from visrag_tpu.models.minicpmv import (MiniCPMVForGeneration,
                                            MiniCPMVGenConfig)
    from visrag_tpu.preprocess.pipeline import PipelineConfig, build_encode_batch
    from visrag_tpu.preprocess.tokenize import MockTokenizer

    cfg = MiniCPMVGenConfig.tiny()
    model = MiniCPMVForGeneration(cfg)
    tok = MockTokenizer()
    pcfg = PipelineConfig(seq_len=64, query_num=cfg.backbone.query_num,
                          patch_size=cfg.backbone.vit.patch_size,
                          src_grid=cfg.backbone.vit.pos_grid,
                          scale_resolution=8, max_patches=64)
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (12, 12, 3), dtype=np.uint8))
    arrs = build_encode_batch(tok, [("what is this?", img)], pcfg,
                              n_slice_slots=8)
    prompt_len = int(arrs["attention_mask"][0].sum())
    ids = arrs["input_ids"][0, :prompt_len]
    slot = arrs["slot_map"][0, :prompt_len]
    vision_batch = {k: jnp.asarray(arrs[k]) for k in
                    ("patches", "patch_mask", "pos_matrix", "grid_h", "grid_w")}

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids[None]),
                        vision_batch=vision_batch,
                        slot_map=jnp.asarray(slot[None]))

    # decode parity vs full forward
    full_logits, _ = model.apply(params, jnp.asarray(ids[None]),
                                 vision_batch=vision_batch,
                                 slot_map=jnp.asarray(slot[None]))
    eng = Engine(model, params, num_slots=2, max_len=128,
                 prompt_buckets=(prompt_len,))
    outs = eng.generate(
        [dict(input_ids=ids, vision_batch=vision_batch, slot_map=slot)],
        sampling=SamplingParams(temperature=0.0, max_tokens=4))
    assert len(outs[0]) == 4
    # first generated token must equal argmax of the full-forward last logits
    assert outs[0][0] == int(np.argmax(np.asarray(full_logits)[0, prompt_len - 1]))


def test_engine_per_request_sampling(tiny_model):
    """Per-request sampling params: a greedy request in the same batch as a
    hot-temperature request still matches HF greedy (the old engine applied
    one batch-level SamplingParams)."""
    import torch
    ref, model, params = tiny_model
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 100, size=(6,)).astype(np.int32)
    with torch.no_grad():
        out = ref.generate(torch.tensor(prompt[None].astype(np.int64)),
                           max_new_tokens=6, do_sample=False)
    want = out[0, 6:].numpy().tolist()

    eng = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,))
    eng.add_request(prompt, sampling=SamplingParams(temperature=0.0,
                                                    max_tokens=6))
    eng.add_request(prompt, sampling=SamplingParams(temperature=3.0,
                                                    max_tokens=6))
    results = eng.run(jax.random.PRNGKey(5))
    assert results[0] == want
    assert len(results[1]) == 6


def test_paged_decode_attention_matches_dense():
    """Paged (block-table) decode attention == dense slot-cache attention,
    including the Pallas kernel in interpret mode."""
    from visrag_tpu.serving.kv_cache import decode_attention
    from visrag_tpu.serving.paged_kv import paged_decode_attention

    rng = np.random.default_rng(0)
    slots, h, kvh, d, bs, mb = 3, 8, 2, 64, 128, 4
    max_len = bs * mb
    q = jnp.asarray(rng.normal(size=(slots, h, d)), jnp.float32)
    dense_k = jnp.asarray(rng.normal(size=(slots, max_len, kvh, d)),
                          jnp.float32)
    dense_v = jnp.asarray(rng.normal(size=(slots, max_len, kvh, d)),
                          jnp.float32)
    lengths = jnp.asarray([5, 300, 512], jnp.int32)
    want = decode_attention(q, dense_k, dense_v, lengths)

    # scatter the dense cache into a shuffled block pool (head-major blocks)
    perm = rng.permutation(slots * mb)
    table = np.asarray(perm).reshape(slots, mb).astype(np.int32)
    k_pool = np.zeros((slots * mb, kvh, bs, d), np.float32)
    v_pool = np.zeros_like(k_pool)
    for s in range(slots):
        for j in range(mb):
            k_pool[table[s, j]] = np.asarray(dense_k)[
                s, j * bs:(j + 1) * bs].transpose(1, 0, 2)
            v_pool[table[s, j]] = np.asarray(dense_v)[
                s, j * bs:(j + 1) * bs].transpose(1, 0, 2)
    got_xla = paged_decode_attention(q, jnp.asarray(k_pool),
                                     jnp.asarray(v_pool),
                                     jnp.asarray(table), lengths)
    np.testing.assert_allclose(np.asarray(got_xla), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    got_kern = paged_decode_attention(q, jnp.asarray(k_pool),
                                      jnp.asarray(v_pool),
                                      jnp.asarray(table), lengths,
                                      interpret=True)
    # the kernel feeds the MXU bf16 operands by design → bf16-level tolerance
    np.testing.assert_allclose(np.asarray(got_kern), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_paged_decode_attention_tp_shard_map():
    """TP paged decode: the shard_map path (pools sharded over kv heads, q
    over heads) == the single-device dense reference — both the XLA inner
    path and the Pallas kernel in interpret mode."""
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh
    from visrag_tpu.serving.kv_cache import decode_attention
    from visrag_tpu.serving.paged_kv import paged_decode_attention

    mesh = build_mesh(MeshConfig(model=2, data=4))
    rng = np.random.default_rng(11)
    slots, h, kvh, d, bs, mb = 3, 8, 2, 64, 128, 4
    max_len = bs * mb
    q = jnp.asarray(rng.normal(size=(slots, h, d)), jnp.float32)
    dense_k = jnp.asarray(rng.normal(size=(slots, max_len, kvh, d)),
                          jnp.float32)
    dense_v = jnp.asarray(rng.normal(size=(slots, max_len, kvh, d)),
                          jnp.float32)
    lengths = jnp.asarray([5, 300, 512], jnp.int32)
    want = decode_attention(q, dense_k, dense_v, lengths)

    perm = rng.permutation(slots * mb)
    table = np.asarray(perm).reshape(slots, mb).astype(np.int32)
    k_pool = np.zeros((slots * mb, kvh, bs, d), np.float32)
    v_pool = np.zeros_like(k_pool)
    for s in range(slots):
        for j in range(mb):
            k_pool[table[s, j]] = np.asarray(dense_k)[
                s, j * bs:(j + 1) * bs].transpose(1, 0, 2)
            v_pool[table[s, j]] = np.asarray(dense_v)[
                s, j * bs:(j + 1) * bs].transpose(1, 0, 2)
    got = paged_decode_attention(q, jnp.asarray(k_pool), jnp.asarray(v_pool),
                                 jnp.asarray(table), lengths, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    got_k = paged_decode_attention(q, jnp.asarray(k_pool),
                                   jnp.asarray(v_pool), jnp.asarray(table),
                                   lengths, mesh=mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want),
                               rtol=2e-2, atol=8e-3)
    # tp that does not divide kvh must be rejected (caller falls to GSPMD)
    bad = build_mesh(MeshConfig(model=4, data=2))
    with pytest.raises(ValueError):
        paged_decode_attention(q, jnp.asarray(k_pool), jnp.asarray(v_pool),
                               jnp.asarray(table), lengths, mesh=bad)


def test_engine_tp_matches_single_device(tiny_model):
    """A MeshConfig(model=2) engine produces token-identical greedy output
    to the single-device engine (VERDICT next-round #1: TP-sharded serving).
    Covers sharded params, kvh-sharded pools, and the shard_map decode."""
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh
    ref, model, params = tiny_model
    rng = np.random.default_rng(21)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(n,)).astype(np.int32))
               for n in (6, 9, 4)]
    sp = SamplingParams(temperature=0.0, max_tokens=6)

    eng1 = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,))
    want = eng1.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(7))

    mesh = build_mesh(MeshConfig(model=2, data=1),
                      devices=jax.devices()[:2])
    eng2 = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,),
                  mesh=mesh)
    assert eng2._attn_mesh is not None       # kvh=2 → shard_map path active
    got = eng2.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(7))
    assert got == want


def test_engine_prompt_group_single_prefill(tiny_model):
    """n-sampling groups prefill each prompt ONCE (VERDICT next-round #2):
    greedy forks are token-identical to an independent request — exercising
    the partial-block copy (prompt len not a block multiple) — and all
    blocks return to the pool (refcount correctness)."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(31)
    # block_size = gcd(128, 16, 64) = 16; length 11 → partial-block copy
    p1 = rng.integers(0, 100, size=(11,)).astype(np.int32)
    # length 16 → exact block boundary, no-copy fork path
    p2 = rng.integers(0, 100, size=(16,)).astype(np.int32)
    sp = SamplingParams(temperature=0.0, max_tokens=6)

    eng0 = Engine(model, params, num_slots=2, max_len=64,
                  prompt_buckets=(16,))
    want = eng0.generate([dict(input_ids=p1), dict(input_ids=p2)],
                         sampling=sp)
    assert eng0.prefill_count == 2

    eng = Engine(model, params, num_slots=3, max_len=64, prompt_buckets=(16,))
    outs = eng.generate([dict(input_ids=p1), dict(input_ids=p2)],
                        sampling=sp, n=8)
    assert eng.prefill_count == 2            # 1 per group, not 16
    assert len(outs) == 16
    for o in outs[:8]:
        assert o == want[0]
    for o in outs[8:]:
        assert o == want[1]
    # every block back in the pool (+1 held null block)
    assert len(eng.allocator.free) + 1 == len(eng.allocator.ref)
    assert all(r == 0 for i, r in enumerate(eng.allocator.ref)
               if i != eng.null_block)


def test_engine_prompt_group_sampled_forks_differ(tiny_model):
    """Hot-temperature forks draw independent first tokens from the shared
    prompt-end logits (vLLM n-sampling semantics, not n copies of one
    sample)."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(32)
    prompt = rng.integers(0, 100, size=(9,)).astype(np.int32)
    eng = Engine(model, params, num_slots=4, max_len=64, prompt_buckets=(16,))
    outs = eng.generate([dict(input_ids=prompt)],
                        sampling=SamplingParams(temperature=5.0,
                                                max_tokens=4),
                        rng=jax.random.PRNGKey(3), n=8)
    assert len(outs) == 8 and len(set(map(tuple, outs))) > 1


def test_engine_many_slots_churn(tiny_model):
    """32 slots under churn: 80 mixed-length requests (some grouped) with a
    pool smaller than slots*max_blocks — exercises the per-chunk host
    bookkeeping and block recycling at a slot count a TP'd 7B server would
    run (VERDICT weak #6: >8 slots was untested)."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(41)
    eng = Engine(model, params, num_slots=32, max_len=64, prompt_buckets=(16,),
                 cache_blocks=32 * 3)
    sp = SamplingParams(temperature=0.8, max_tokens=6)
    rids = []
    for i in range(20):
        n = 1 + (i % 3)          # mix of singles and groups
        r = eng.add_request(
            rng.integers(0, 100, size=(int(rng.integers(3, 15)),))
            .astype(np.int32), sampling=sp, n=n)
        rids.extend(r if isinstance(r, list) else [r])
    results = eng.run(jax.random.PRNGKey(9))
    assert sorted(results) == sorted(rids)
    assert all(1 <= len(results[r]) <= 6 for r in rids)
    # pool fully drained (null block held)
    assert len(eng.allocator.free) + 1 == len(eng.allocator.ref)


def test_engine_block_recycling(tiny_model):
    """A pool smaller than slots×max_len serves more requests than its
    capacity by recycling blocks as requests finish."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(5)
    # 2 slots, pool of 6 blocks (block_size = gcd(16, 64, 128) = 16):
    # each request needs ceil(16/16)+... ≤ 3 blocks
    eng = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,),
                 cache_blocks=6)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(n,)).astype(np.int32))
               for n in (5, 7, 6, 4, 8, 5)]
    outs = eng.generate(prompts, sampling=SamplingParams(temperature=0.0,
                                                         max_tokens=4))
    assert len(outs) == 6 and all(len(o) == 4 for o in outs)
    # all blocks returned to the free list (+ null block held)
    assert len(eng.allocator.free) == 6


def test_engine_batched_prefill_matches_single(tiny_model):
    """Batched prefill (one dispatch for K same-bucket prompts) produces
    greedy output identical to the single-dispatch path, and actually
    batches (prefill_dispatches < prompts)."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(41)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(n,))
                    .astype(np.int32))
               for n in (6, 9, 4, 11, 7)]
    sp = SamplingParams(temperature=0.0, max_tokens=6)

    # single path: num_slots=1 serializes placements (batch needs ≥2 free)
    eng1 = Engine(model, params, num_slots=1, max_len=64, prompt_buckets=(16,))
    want = [eng1.generate([p], sampling=sp)[0] for p in prompts]
    assert eng1.prefill_dispatches == 5

    eng = Engine(model, params, num_slots=8, max_len=64, prompt_buckets=(16,))
    got = eng.generate(prompts, sampling=sp)
    assert got == want
    # 5 same-bucket prompts → one K=4 dispatch + one single = 2 dispatches
    assert eng.prefill_count == 5 and eng.prefill_dispatches == 2


def test_engine_batched_prefill_with_groups(tiny_model):
    """Group leaders participate in batched prefill one-per-group; fork
    outputs stay identical to the unbatched engine."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(43)
    p1 = rng.integers(0, 100, size=(6,)).astype(np.int32)
    p2 = rng.integers(0, 100, size=(9,)).astype(np.int32)
    sp = SamplingParams(temperature=0.0, max_tokens=5)

    eng1 = Engine(model, params, num_slots=1, max_len=64, prompt_buckets=(16,))
    w1 = eng1.generate([dict(input_ids=p1)], sampling=sp)[0]
    w2 = eng1.generate([dict(input_ids=p2)], sampling=sp)[0]

    eng = Engine(model, params, num_slots=8, max_len=64, prompt_buckets=(16,))
    outs = eng.generate([dict(input_ids=p1), dict(input_ids=p2)],
                        sampling=sp, n=3)
    assert eng.prefill_count == 2        # one per group
    assert outs == [w1] * 3 + [w2] * 3   # greedy forks identical


def test_engine_block_backpressure(tiny_model):
    """A queue whose total KV need exceeds the pool: placements defer (vLLM
    scheduling role) instead of crashing, every request completes, and
    outputs equal the unconstrained engine's."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(51)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(12,))
                    .astype(np.int32)) for _ in range(6)]
    sp = SamplingParams(temperature=0.0, max_tokens=8)

    big = Engine(model, params, num_slots=6, max_len=64, prompt_buckets=(16,))
    want = big.generate(prompts, sampling=sp)

    # pool sized for ~2 concurrent requests (each needs 2 blocks of 16)
    small = Engine(model, params, num_slots=6, max_len=64,
                   prompt_buckets=(16,), cache_blocks=5)
    got = small.generate(prompts, sampling=sp)
    assert got == want

    # a single impossible request still raises a clear error
    impossible = Engine(model, params, num_slots=2, max_len=64,
                        prompt_buckets=(16,), cache_blocks=1)
    with pytest.raises(RuntimeError, match="KV pool too small"):
        impossible.generate([prompts[0]], sampling=sp)


def _rand_init_engine_pair(text_over, tp, num_slots=2):
    """Random-init tiny Qwen with overridden text geometry; return (model,
    params, prompts, sampling)."""
    import dataclasses as dc

    from visrag_tpu.models.qwen25_vl import QwenTextConfig
    cfg = Qwen25VLConfig.tiny(text=QwenTextConfig.tiny(**text_over))
    model = Qwen25VL(cfg)
    rng = np.random.default_rng(13)
    dummy = jnp.asarray(rng.integers(1, 90, size=(1, 8)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(8), (3, 1, 8)).astype(jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), dummy, positions=pos)
    prompts = [dict(input_ids=rng.integers(1, 90, size=(n,)).astype(np.int32))
               for n in (6, 9, 4)]
    return model, params, prompts


@pytest.mark.parametrize("tp", [4, 8])
def test_engine_tp4_tp8_matches_single_device(tp):
    """tp ≥ 4 at the big-preset geometry (kvh=8, the 32B/72B presets'
    TP8 regime — assets/baselines.md:26,42; VERDICT round-2 weak #6):
    token-identical greedy output to the tp=1 engine, with the
    zero-collective shard_map decode active."""
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh
    model, params, prompts = _rand_init_engine_pair(
        dict(hidden_size=64, num_attention_heads=8, num_key_value_heads=8,
             mrope_section=(2, 1, 1)), tp)
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    eng1 = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,))
    want = eng1.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(7))
    mesh = build_mesh(MeshConfig(model=tp, data=1),
                      devices=jax.devices()[:tp])
    eng2 = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,),
                  mesh=mesh)
    assert eng2._attn_mesh is not None     # kvh % tp == 0 → shard_map decode
    got = eng2.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(7))
    assert got == want


def test_engine_tp_wider_than_kvh_falls_back_to_gspmd(tiny_model):
    """tp=4 > kvh=2 (the 3B-at-tp4 case): the engine must NOT use the
    zero-collective shard_map path (it requires whole kv groups per shard);
    it replicates the pools and lets GSPMD partition the XLA decode over q
    heads — output still token-identical (VERDICT round-2 weak #6)."""
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh
    ref, model, params = tiny_model
    rng = np.random.default_rng(29)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(n,))
                    .astype(np.int32)) for n in (6, 4)]
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    eng1 = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,))
    want = eng1.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(7))
    mesh = build_mesh(MeshConfig(model=4, data=1), devices=jax.devices()[:4])
    eng2 = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,),
                  mesh=mesh)
    assert eng2._attn_mesh is None         # kvh=2 < tp=4 → GSPMD fallback
    got = eng2.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(7))
    assert got == want


def test_prefill_token_budget_bounds_decode_starvation(tiny_model):
    """With prefill_token_budget set, queued prompts cannot starve live
    decode slots: between two consecutive decode chunks the engine
    dispatches at most ceil(budget/bucket) prefills (VERDICT round-2 weak
    #2 done-criterion). Without the budget, every placeable prompt
    prefills ahead of the first decode chunk."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(31)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(n,))
                    .astype(np.int32))
               for n in (6, 20, 7, 21, 9, 22)]   # mixed buckets: no batching
    sp = SamplingParams(temperature=0.0, max_tokens=8)

    def sched(budget):
        eng = Engine(model, params, num_slots=8, max_len=64,
                     prompt_buckets=(16, 32), prefill_token_budget=budget)
        eng.record_schedule = True
        out = eng.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(3))
        return eng, out

    eng_b, out_b = sched(budget=16)
    eng_n, out_n = sched(budget=None)
    assert out_b == out_n                      # scheduling ≠ results

    def max_p_run(log):
        run = best = 0
        for ev in log:
            run = run + 1 if ev == "P" else 0
            best = max(best, run)
        return best

    # budget=16 with buckets ≥16 ⇒ at most ONE prefill dispatch between
    # decode chunks; the unbudgeted engine front-loads several
    assert max_p_run(eng_b.sched_log) == 1, eng_b.sched_log
    assert max_p_run(eng_n.sched_log) > 1, eng_n.sched_log


def test_request_latency_bookkeeping(tiny_model):
    """Requests carry enqueue/first-token/emission timestamps for the
    serve-latency benches (TTFT + chunk-granular inter-token gaps)."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(5)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(6,))
                    .astype(np.int32)) for _ in range(3)]
    eng = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,))
    reqs = eng.generate_detailed(
        prompts, sampling=SamplingParams(temperature=0.0, max_tokens=40),
        rng=jax.random.PRNGKey(0))
    for r in reqs:
        assert r.t_first is not None and r.t_first >= r.t_enqueue
        assert sum(n for _, n in r.emits) == len(r.output_ids)
        times = [t for t, _ in r.emits]
        assert times == sorted(times)


def test_chunked_prefill_matches_whole(tiny_model):
    """Chunked prefill (chunked_prefill_tokens=16, prompts of 40/33/20
    tokens → 3/3/2 chunks) produces greedy output token-identical to the
    whole-prompt engine, including an n-sampling group whose leader
    chunk-prefills and whose forks share its KV blocks."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(17)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(n,))
                    .astype(np.int32)) for n in (40, 33, 20)]
    sp = SamplingParams(temperature=0.0, max_tokens=6)

    eng1 = Engine(model, params, num_slots=4, max_len=128,
                  prompt_buckets=(64,))
    want = eng1.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(7), n=2)
    eng2 = Engine(model, params, num_slots=4, max_len=128,
                  prompt_buckets=(16, 64), chunked_prefill_tokens=16)
    got = eng2.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(7), n=2)
    assert got == want
    # the long prompts actually went through the chunked path
    assert eng2.prefill_dispatches > eng1.prefill_dispatches
    assert eng2.prefill_count == eng1.prefill_count == 3


def test_chunked_prefill_interleaves_with_decode(tiny_model):
    """While a slot decodes, a queued long prompt prefills chunk-at-a-time:
    the schedule trace shows C steps separated by D steps (never more than
    budget//C consecutive chunk steps while a decode is live)."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(23)
    short = dict(input_ids=rng.integers(0, 100, size=(6,)).astype(np.int32))
    long1 = dict(input_ids=rng.integers(0, 100, size=(60,)).astype(np.int32))
    long2 = dict(input_ids=rng.integers(0, 100, size=(57,)).astype(np.int32))
    eng = Engine(model, params, num_slots=3, max_len=128,
                 prompt_buckets=(16, 64), chunked_prefill_tokens=16,
                 prefill_token_budget=16)
    eng.record_schedule = True
    # the short prompt decodes for the whole run; the long prompts must
    # not starve it: chunk steps interleave one-per-decode-chunk
    r0 = eng.add_request(**short,
                         sampling=SamplingParams(temperature=0.0,
                                                 max_tokens=100))
    r1 = eng.add_request(**long1,
                         sampling=SamplingParams(temperature=0.0,
                                                 max_tokens=8))
    r2 = eng.add_request(**long2,
                         sampling=SamplingParams(temperature=0.0,
                                                 max_tokens=8))
    out = eng.run(rng=jax.random.PRNGKey(1))
    assert len(out[r0]) == 100 and len(out[r1]) == 8 and len(out[r2]) == 8
    log = "".join(eng.sched_log)
    assert "C" in log and "D" in log, log
    # with budget == one chunk, no two chunk steps may run back-to-back
    # while a decode slot is live (the short prompt decodes throughout)
    assert "CC" not in log, log


def test_batched_prefill_window_skips_chunkable(tiny_model):
    """A chunkable (over-bucket) prompt sitting in the batched-prefill
    selection window must be skipped, not bucketed: with short prompts at
    the head and a 40-token prompt queued behind them, run() used to crash
    in _bucket ('exceeds largest bucket') before the long prompt ever
    reached the chunked path."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(31)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(n,))
                    .astype(np.int32)) for n in (10, 9, 40)]
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    want = Engine(model, params, num_slots=4, max_len=128,
                  prompt_buckets=(64,)).generate(
        prompts, sampling=sp, rng=jax.random.PRNGKey(2))
    eng = Engine(model, params, num_slots=4, max_len=128,
                 prompt_buckets=(16,), chunked_prefill_tokens=16)
    got = eng.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(2))
    assert got == want


def test_chunked_prefill_grid_past_max_len(tiny_model):
    """max_len NOT a multiple of chunk_tokens: the C-aligned chunk grid of
    a near-max_len prompt rounds past max_len (10 blocks vs max_blocks 9).
    The final chunk must trim the excess grid blocks back to the pool
    instead of overflowing the slot's table row (numpy broadcast crash)."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(37)
    ids = rng.integers(0, 100, size=(68,)).astype(np.int32)
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    want = Engine(model, params, num_slots=2, max_len=128,
                  prompt_buckets=(128,)).generate(
        [dict(input_ids=ids)], sampling=sp, rng=jax.random.PRNGKey(3))
    eng = Engine(model, params, num_slots=2, max_len=72,
                 prompt_buckets=(16,), chunked_prefill_tokens=16)
    assert eng.max_blocks == 9 and eng.block_size == 8
    free0 = len(eng.allocator.free)
    got = eng.generate([dict(input_ids=ids)], sampling=sp,
                       rng=jax.random.PRNGKey(3))
    assert got == want
    assert len(eng.allocator.free) == free0   # excess grid block released


def test_engine_sleep_wake(tiny_model):
    """sleep() frees the KV pools between uses (vLLM sleep-mode role);
    run()/wake() reallocates and generation stays correct."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(3)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(6,))
                    .astype(np.int32))]
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    eng = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(16,))
    want = eng.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(0))
    eng.sleep()
    assert eng.k_cache is None and eng.v_cache is None
    got = eng.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(0))
    assert got == want
    eng.sleep()
    eng.sleep()          # idempotent
    eng.wake()
    eng.wake()


def test_chunked_prefill_vision_matches_whole(tiny_model):
    """MULTIMODAL chunked prefill: the vision tower runs once
    (embed_prompt) and the chunks slice the embeds table — greedy output
    token-identical to the whole-prompt engine (the EVisRAG 15k-token
    image-heavy prompts are exactly this regime)."""
    from test_rl import _vision_prompt
    ref, model, params = tiny_model
    rng = np.random.default_rng(41)
    cfg = model.cfg
    # px=112 → enough image tokens to exceed one 16-token chunk
    vp = _vision_prompt(rng, cfg, px=112)
    vp.pop("ground_truth")
    tp = dict(input_ids=rng.integers(0, 100, size=(40,)).astype(np.int32))
    sp = SamplingParams(temperature=0.0, max_tokens=6)

    eng1 = Engine(model, params, num_slots=2, max_len=256,
                  prompt_buckets=(128,))
    want = eng1.generate([vp, tp], sampling=sp, rng=jax.random.PRNGKey(7))
    eng2 = Engine(model, params, num_slots=2, max_len=256,
                  prompt_buckets=(16, 128), chunked_prefill_tokens=16)
    eng2.record_schedule = True
    got = eng2.generate([vp, tp], sampling=sp, rng=jax.random.PRNGKey(7))
    assert got == want
    # both prompts actually chunked (no "P" prefill dispatches at all)
    assert "P" not in eng2.sched_log, eng2.sched_log


def test_chunked_prefill_under_tp(tiny_model):
    """Chunked prefill composes with tensor parallelism: the chunk jit's
    pool writes/gathers run GSPMD-partitioned over the kvh-sharded pools —
    token-identical to the single-device whole-prompt engine."""
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh
    ref, model, params = tiny_model
    rng = np.random.default_rng(43)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(n,))
                    .astype(np.int32)) for n in (40, 20)]
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    eng1 = Engine(model, params, num_slots=2, max_len=128,
                  prompt_buckets=(64,))
    want = eng1.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(7))
    mesh = build_mesh(MeshConfig(model=2, data=1), devices=jax.devices()[:2])
    eng2 = Engine(model, params, num_slots=2, max_len=128,
                  prompt_buckets=(16, 64), chunked_prefill_tokens=16,
                  mesh=mesh)
    got = eng2.generate(prompts, sampling=sp, rng=jax.random.PRNGKey(7))
    assert got == want


def test_prefix_cache_reuses_blocks(tiny_model):
    """Automatic prefix caching (vLLM role): a second prompt sharing a long
    prefix skips the cached chunks — fewer prefill dispatches, identical
    greedy outputs to an engine without the cache."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(47)
    prefix = rng.integers(0, 100, size=(48,)).astype(np.int32)
    p1 = dict(input_ids=np.concatenate(
        [prefix, rng.integers(0, 100, size=(6,)).astype(np.int32)]))
    p2 = dict(input_ids=np.concatenate(
        [prefix, rng.integers(0, 100, size=(9,)).astype(np.int32)]))
    p_same = dict(input_ids=p1["input_ids"].copy())
    sp = SamplingParams(temperature=0.0, max_tokens=5)

    def fresh(cache):
        return Engine(model, params, num_slots=1, max_len=128,
                      prompt_buckets=(16, 64), chunked_prefill_tokens=16,
                      prefix_cache=cache)

    eng0 = fresh(False)
    want = [eng0.generate([p], sampling=sp, rng=jax.random.PRNGKey(4))[0]
            for p in (p1, p2, p_same)]
    eng = fresh(True)
    d0 = []
    got = []
    for p in (p1, p2, p_same):
        before = eng.prefill_dispatches
        got.append(eng.generate([p], sampling=sp,
                                rng=jax.random.PRNGKey(4))[0])
        d0.append(eng.prefill_dispatches - before)
    assert got == want, (got, want)
    # p1 prefilled all 4 chunks; p2 shares 48 prefix tokens = 3 blocks of
    # 16 → resumes at chunk 3; p_same (identical prompt) recomputes only
    # the final chunk
    assert d0[0] == 4 and d0[1] < d0[0] and d0[2] == 1, d0
    assert eng.prefix_hits > 0


def _vision_prefix_prompt(rng, cfg, prefix, px=112, tail=4, img_rng=None):
    """Vision prompt with an explicit shared TEXT prefix before the image
    (the EVisRAG evidence-instruction layout, predict.py:100-105)."""
    from PIL import Image
    from visrag_tpu.models.mrope import get_rope_index
    from visrag_tpu.preprocess.qwen_vision import prepare_vision_batch

    irng = img_rng if img_rng is not None else rng
    img = Image.fromarray(irng.integers(0, 255, (px, px, 3), dtype=np.uint8))
    vb = prepare_vision_batch([img], head_dim=cfg.vision.head_dim,
                              patch_size=cfg.vision.patch_size,
                              min_pixels=16 * 16, max_pixels=px * px)
    n_img = vb.n_tokens
    ids = np.concatenate([
        np.asarray(prefix, np.int32),
        np.full((n_img,), cfg.image_token_id),
        rng.integers(0, 100, size=(tail,)),
    ]).astype(np.int32)
    pos = get_rope_index(ids, vb.grid_thw, cfg.image_token_id)
    slot = np.full(ids.shape, -1, np.int32)
    slot[ids == cfg.image_token_id] = np.arange(n_img)
    vision_batch = {k: getattr(vb, k) for k in
                    ("patches", "rot_cos", "rot_sin", "seg_window",
                     "seg_full", "reverse_index")}
    return dict(input_ids=ids, positions=pos, vision_batch=vision_batch,
                slot_map=slot)


def test_prefix_cache_vision_pre_image_span(tiny_model):
    """Multimodal prefix caching (VERDICT round-4 #3): vision prompts share
    the pre-first-image TEXT span. A second vision prompt with the same
    evidence instruction resumes past the cached text chunks, and a text
    prompt with the same leading ids shares them too (pre-image K/V is a
    pure function of the ids under causal attention). Greedy outputs must
    be identical to an engine without the cache."""
    ref, model, params = tiny_model
    cfg = model.cfg
    rng = np.random.default_rng(83)
    prefix = rng.integers(0, 100, size=(48,)).astype(np.int32)
    p1 = _vision_prefix_prompt(rng, cfg, prefix)
    p2 = _vision_prefix_prompt(rng, cfg, prefix)   # different image + tail
    p3 = dict(input_ids=np.concatenate(
        [prefix, rng.integers(0, 100, size=(9,)).astype(np.int32)]))
    sp = SamplingParams(temperature=0.0, max_tokens=4)

    def fresh(cache):
        return Engine(model, params, num_slots=1, max_len=256,
                      prompt_buckets=(16, 128), chunked_prefill_tokens=16,
                      prefix_cache=cache)

    eng0 = fresh(False)
    want = [eng0.generate([p], sampling=sp, rng=jax.random.PRNGKey(4))[0]
            for p in (p1, p2, p3)]
    eng = fresh(True)
    got, disp = [], []
    for p in (p1, p2, p3):
        before = eng.prefill_dispatches
        got.append(eng.generate([p], sampling=sp,
                                rng=jax.random.PRNGKey(4))[0])
        disp.append(eng.prefill_dispatches - before)
    assert got == want, (got, want)
    # p2 and p3 both resumed past cached text chunks
    assert disp[1] < disp[0], disp
    assert eng.prefix_hits > 0


def test_prefix_cache_vision_no_image_block_cross_hit(tiny_model):
    """Correctness guard: two vision prompts with IDENTICAL token ids but
    DIFFERENT images must never share image-span blocks — image-pad K/V
    depends on pixel content the id-keyed chain cannot see. Only the
    pre-image text span may hit; outputs equal the uncached engine."""
    ref, model, params = tiny_model
    cfg = model.cfg
    rng = np.random.default_rng(89)
    prefix = rng.integers(0, 100, size=(48,)).astype(np.int32)
    tail_rng = np.random.default_rng(5)
    imgs = [np.random.default_rng(s) for s in (11, 22)]
    prompts = []
    for ir in imgs:
        prompts.append(_vision_prefix_prompt(
            np.random.default_rng(5), cfg, prefix, img_rng=ir))
    # identical ids/positions/slots, different pixels
    np.testing.assert_array_equal(prompts[0]["input_ids"],
                                  prompts[1]["input_ids"])
    assert not np.array_equal(
        np.asarray(prompts[0]["vision_batch"]["patches"]),
        np.asarray(prompts[1]["vision_batch"]["patches"]))
    sp = SamplingParams(temperature=0.0, max_tokens=4)

    def fresh(cache):
        return Engine(model, params, num_slots=1, max_len=256,
                      prompt_buckets=(16, 128), chunked_prefill_tokens=16,
                      prefix_cache=cache)

    eng0 = fresh(False)
    want = [eng0.generate([p], sampling=sp, rng=jax.random.PRNGKey(4))[0]
            for p in prompts]
    eng = fresh(True)
    got = [eng.generate([p], sampling=sp, rng=jax.random.PRNGKey(4))[0]
           for p in prompts]
    assert got == want, (got, want)
    assert eng.prefix_hits > 0     # the text span did hit
    # the cache holds only pre-image chain entries: at most prefix//bs
    assert len(eng._prefix_cache) <= len(prefix) // eng.block_size


def test_add_request_validates_length(tiny_model):
    """Bad prompts fail at add_request, not mid-run: a max_len prompt has
    no room for even one generated token; an over-bucket prompt that cannot
    chunk has no dispatch path."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(61)
    eng = Engine(model, params, num_slots=2, max_len=64, prompt_buckets=(64,))
    with pytest.raises(ValueError, match="KV slots"):
        eng.add_request(rng.integers(0, 100, size=(64,)).astype(np.int32))
    eng2 = Engine(model, params, num_slots=2, max_len=128,
                  prompt_buckets=(16,))
    with pytest.raises(ValueError, match="chunked"):
        eng2.add_request(rng.integers(0, 100, size=(40,)).astype(np.int32))


def test_set_params_clears_prefix_cache(tiny_model):
    """Cached prefix KV was computed with the old weights: set_params must
    drop it (and release its block references) or generations after a
    weight update silently attend stale KV."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(67)
    p = dict(input_ids=rng.integers(0, 100, size=(40,)).astype(np.int32))
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    eng = Engine(model, params, num_slots=1, max_len=128,
                 prompt_buckets=(16, 64), chunked_prefill_tokens=16,
                 prefix_cache=True)
    want = eng.generate([p], sampling=sp, rng=jax.random.PRNGKey(0))
    assert len(eng._prefix_cache) > 0
    free_before = len(eng.allocator.free)
    eng.set_params(params)
    assert len(eng._prefix_cache) == 0
    assert len(eng.allocator.free) > free_before   # cache refs released
    d0 = eng.prefill_dispatches
    got = eng.generate([p], sampling=sp, rng=jax.random.PRNGKey(0))
    assert got == want
    assert eng.prefill_dispatches - d0 == 3        # full re-prefill, no hits


def test_prefix_cache_shares_only_below_resume_point(tiny_model):
    """Cached blocks are refcount-shared READ-ONLY: the resumed chunk
    rewrites its whole [lo, lo+C) row range, so blocks straddling the
    resume point must be recomputed privately, never shared. Observable as
    hits == blocks fully below the chunk-aligned resume point (4, not the
    full 5-block match for a 40-token prompt at bs=8, C=16; max_len=72
    makes the gcd-derived block_size 8 so blocks straddle chunks)."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(71)
    p = dict(input_ids=rng.integers(0, 100, size=(40,)).astype(np.int32))
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    eng = Engine(model, params, num_slots=1, max_len=72,
                 prompt_buckets=(16, 64), chunked_prefill_tokens=16,
                 prefix_cache=True)
    assert eng.block_size == 8
    want = eng.generate([p], sampling=sp, rng=jax.random.PRNGKey(0))
    d0, h0 = eng.prefill_dispatches, eng.prefix_hits
    got = eng.generate([p], sampling=sp, rng=jax.random.PRNGKey(0))
    assert got == want
    assert eng.prefix_hits - h0 == 4, eng.prefix_hits - h0
    assert eng.prefill_dispatches - d0 == 1


def test_prefix_cache_bucketed_prompts_populate(tiny_model):
    """Sub-chunk prompts go through bucketed prefill and cannot MATCH (no
    resume point) but must POPULATE the cache: a later long prompt sharing
    their prefix resumes past it."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(73)
    short = rng.integers(0, 100, size=(16,)).astype(np.int32)
    long_ids = np.concatenate(
        [short, rng.integers(0, 100, size=(24,)).astype(np.int32)])
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    eng0 = Engine(model, params, num_slots=1, max_len=72,
                  prompt_buckets=(16, 64), chunked_prefill_tokens=16)
    want = [eng0.generate([dict(input_ids=i)], sampling=sp,
                          rng=jax.random.PRNGKey(0))[0]
            for i in (short, long_ids)]
    eng = Engine(model, params, num_slots=1, max_len=72,
                 prompt_buckets=(16, 64), chunked_prefill_tokens=16,
                 prefix_cache=True)
    assert eng.block_size == 8
    got0 = eng.generate([dict(input_ids=short)], sampling=sp,
                        rng=jax.random.PRNGKey(0))[0]
    assert len(eng._prefix_cache) == 2            # bucketed prompt inserted
    d0 = eng.prefill_dispatches
    got1 = eng.generate([dict(input_ids=long_ids)], sampling=sp,
                        rng=jax.random.PRNGKey(0))[0]
    assert [got0, got1] == want
    assert eng.prefix_hits == 2                   # resumed at token 16
    assert eng.prefill_dispatches - d0 == 2       # chunks [16,32) + [32,40)


def test_pressure_spares_heads_own_prefix_chain(tiny_model):
    """Under pool pressure, _blocks_needed discounts the blocks a prefix
    hit will share — otherwise the scheduler evicts the head's own cached
    chain to make room it doesn't need and recomputes from scratch."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(79)
    p = dict(input_ids=rng.integers(0, 100, size=(32,)).astype(np.int32))
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    eng = Engine(model, params, num_slots=1, max_len=72,
                 prompt_buckets=(16, 64), chunked_prefill_tokens=16,
                 prefix_cache=True, cache_blocks=8)
    assert eng.block_size == 8
    want = eng.generate([p], sampling=sp, rng=jax.random.PRNGKey(0))
    # cache now holds the 4 full prompt blocks; free = 8 - 4 = 4 < the 5
    # undiscounted blocks the same prompt "needs" — the discounted need (3)
    # must place WITHOUT evicting the chain
    assert len(eng.allocator.free) == 4
    d0 = eng.prefill_dispatches
    got = eng.generate([p], sampling=sp, rng=jax.random.PRNGKey(0))
    assert got == want
    assert eng.prefix_hits == 2                   # resumed at token 16
    assert eng.prefill_dispatches - d0 == 1       # only chunk [16,32) reran


def test_allocator_rejects_double_release():
    from visrag_tpu.serving.paged_kv import BlockAllocator
    a = BlockAllocator(4)
    b = a.alloc(2)
    a.release(b)
    with pytest.raises(AssertionError, match="double release"):
        a.release(b)


def test_prefix_cache_eviction_under_pressure(tiny_model):
    """A tiny pool forces LRU eviction of cached prefixes; outputs stay
    correct and the allocator stays balanced across many requests."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(53)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(48,))
                    .astype(np.int32)) for _ in range(6)]
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    eng0 = Engine(model, params, num_slots=1, max_len=128,
                  prompt_buckets=(16, 64), chunked_prefill_tokens=16)
    want = [eng0.generate([p], sampling=sp, rng=jax.random.PRNGKey(1))[0]
            for p in prompts]
    # pool barely fits one request (+cache crumbs): evictions must trigger
    eng = Engine(model, params, num_slots=1, max_len=128,
                 prompt_buckets=(16, 64), chunked_prefill_tokens=16,
                 prefix_cache=True, cache_blocks=10)
    got = [eng.generate([p], sampling=sp, rng=jax.random.PRNGKey(1))[0]
           for p in prompts]
    assert got == want
    eng.sleep()      # releases cache refs; would assert on imbalance
    assert len(eng.allocator.free) == 10


def test_logit_bias_bans_tokens_all_paths(tiny_model):
    """SamplingParams.logit_bias (the reference rollout's image-token ban,
    vllm_rollout_spmd.py:42-49: {image_token_id: -100}) suppresses banned
    ids in every sampling path: whole prefill, batched prefill, n-sampling
    forks, decode, and chunked prefill."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(61)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(12,))
                    .astype(np.int32)) for _ in range(3)]
    long_prompt = dict(input_ids=rng.integers(0, 100, size=(40,))
                       .astype(np.int32))

    def run(bias, n=1, chunked=False):
        kw = dict(num_slots=4, max_len=128, prompt_buckets=(16, 64))
        if chunked:
            kw["chunked_prefill_tokens"] = 16
        eng = Engine(model, params, **kw)
        sp = SamplingParams(temperature=0.0, max_tokens=8, logit_bias=bias)
        ps = prompts + ([long_prompt] if chunked else [])
        return eng.generate(ps, sampling=sp, rng=jax.random.PRNGKey(7), n=n)

    # greedy baseline: collect the ids the model actually wants to emit
    base = run((), n=2, chunked=True)
    banned = sorted({t for o in base for t in o})[:8]
    assert banned, "baseline emitted nothing to ban"
    bias = tuple((t, -1e9) for t in banned)

    got = run(bias, n=2, chunked=True)     # forks + batched + chunked
    for o in got:
        assert not set(o) & set(banned), (o, banned)
    # single-request path too (no batching possible)
    eng = Engine(model, params, num_slots=1, max_len=64,
                 prompt_buckets=(16,))
    out = eng.generate([prompts[0]],
                       sampling=SamplingParams(temperature=0.0, max_tokens=8,
                                               logit_bias=bias),
                       rng=jax.random.PRNGKey(7))[0]
    assert not set(out) & set(banned)
    # outputs still differ from the unbanned run (the ban did something)
    assert got != base


def test_logit_bias_forks_not_double_biased(tiny_model):
    """A MODERATE logit bias must be applied exactly once to n-sampling
    forks: the whole-prefill path publishes RAW prompt-end logits for the
    group (the bias is added once, in _fork_fn), so fork tokens and
    cum_logprobs are identical to the chunked-prefill path, which always
    published raw logits. A double application (biasing the published
    array in place AND in _fork_fn) skews fork sampling at any |bias|
    small enough not to ban outright — invisible to the -1e9 ban test."""
    ref, model, params = tiny_model
    rng = np.random.default_rng(62)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(18,))
                    .astype(np.int32)) for _ in range(2)]

    def run(chunked):
        kw = dict(num_slots=4, max_len=128, prompt_buckets=(16, 64))
        if chunked:
            kw["chunked_prefill_tokens"] = 16   # 18-token prompts chunk
        eng = Engine(model, params, **kw)
        sp = SamplingParams(temperature=0.0, max_tokens=6,
                            logit_bias=((5, 1.5), (7, -1.5)))
        reqs = eng.generate_detailed(prompts, sampling=sp,
                                     rng=jax.random.PRNGKey(3), n=2)
        return [(r.output_ids, r.cum_logprob) for r in reqs]

    whole, chunked = run(False), run(True)
    # tokens exactly equal; logprobs to 1e-3 (whole vs chunked prefill
    # accumulate differently at f32 noise scale — a double-applied 1.5
    # bias would shift fork logprobs by O(1))
    for (tw, lw), (tc, lc) in zip(whole, chunked):
        assert tw == tc, (whole, chunked)
        assert abs(lw - lc) < 1e-3, (whole, chunked)


def test_logit_bias_too_many_entries_raises(tiny_model):
    ref, model, params = tiny_model
    eng = Engine(model, params, num_slots=1, max_len=64,
                 prompt_buckets=(16,), max_logit_bias=2)
    sp = SamplingParams(temperature=0.0, max_tokens=2,
                        logit_bias=((1, -1.0), (2, -1.0), (3, -1.0)))
    with pytest.raises(ValueError, match="logit_bias"):
        eng.generate([dict(input_ids=np.arange(8, dtype=np.int32))],
                     sampling=sp)
