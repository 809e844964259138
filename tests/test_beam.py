"""Beam search parity vs transformers' generate() (the reference scores
weighted-selection answers with HF beam search: num_beams=3,
repetition_penalty=1.2 — weighted_selection/MiniCPMV20/modeling_minicpmv.py
:360-392, invoked with sampling=False by visrag_scripts/generate/generate.py
:445-453)."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def models():
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    ref, _ = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    model = Qwen25VL(Qwen25VLConfig.tiny())
    return ref, model, params


def _hf_beam(ref, ids, *, num_beams, max_new_tokens, rep, eos):
    eos_list = list(eos) if isinstance(eos, (list, tuple)) else [eos]
    out = ref.generate(
        torch.tensor(ids[None].tolist()), num_beams=num_beams,
        do_sample=False, max_new_tokens=max_new_tokens,
        repetition_penalty=rep, eos_token_id=eos, pad_token_id=0,
        return_dict_in_generate=True, output_scores=True)
    seq = out.sequences[0, len(ids):].tolist()
    # strip the EOS and trailing pads HF appends
    while seq and (seq[-1] == 0 or seq[-1] in eos_list):
        seq.pop()
    return seq, float(out.sequences_scores[0])


@pytest.mark.parametrize("rep", [1.0, 1.2])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_search_matches_hf(models, rep, seed):
    from visrag_tpu.serving.beam import beam_search
    ref, model, params = models
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 90, size=(int(rng.integers(4, 12)),)) \
        .astype(np.int32)
    eos = 97
    want_seq, want_score = _hf_beam(ref, ids, num_beams=3,
                                    max_new_tokens=12, rep=rep, eos=eos)
    got_seq, got_score = beam_search(model, params, ids, num_beams=3,
                                     max_new_tokens=12, eos_token_ids=[eos],
                                     repetition_penalty=rep)
    assert got_seq == want_seq, (got_seq, want_seq)
    assert abs(got_score - want_score) < 5e-3, (got_score, want_score)


@pytest.mark.parametrize("seed", [0, 3, 5])
def test_beam_search_multi_eos_matches_hf(models, seed):
    """Many EOS ids: the candidate pool must widen to HF's
    max(2, 1+n_eos)*k, or a step where beams pick several EOS variants
    shrinks the beam set below k (old IndexError on the next step)."""
    from visrag_tpu.serving.beam import beam_search
    ref, model, params = models
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 90, size=(7,)).astype(np.int32)
    eos = sorted({int(t) for t in rng.integers(1, 120, size=(12,))})
    want_seq, want_score = _hf_beam(ref, ids, num_beams=3,
                                    max_new_tokens=10, rep=1.0, eos=eos)
    got_seq, got_score = beam_search(model, params, ids, num_beams=3,
                                     max_new_tokens=10, eos_token_ids=eos,
                                     repetition_penalty=1.0)
    assert got_seq == want_seq, (got_seq, want_seq)
    assert abs(got_score - want_score) < 5e-3, (got_score, want_score)


@pytest.mark.parametrize("rep", [1.0, 1.2])
def test_beam_search_batched_matches_sequential(models, rep):
    """beam_search_batched runs P prompts' k-beam loops in one batched
    decode; tokens and scores must be identical to per-prompt beam_search
    (varying prompt lengths; EOS set so prompts finish at different steps
    and exercise the done-prompt freeze path)."""
    from visrag_tpu.serving.beam import beam_search, beam_search_batched
    ref, model, params = models
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 90, size=(int(rng.integers(4, 14)),))
               .astype(np.int32) for _ in range(4)]
    eos = [97, 55]
    got = beam_search_batched(
        model, params, [dict(input_ids=p) for p in prompts], num_beams=3,
        max_new_tokens=10, eos_token_ids=eos, repetition_penalty=rep)
    for p, (seq_b, score_b) in zip(prompts, got):
        seq_s, score_s = beam_search(model, params, p, num_beams=3,
                                     max_new_tokens=10, eos_token_ids=eos,
                                     repetition_penalty=rep)
        assert seq_b == seq_s, (seq_b, seq_s)
        np.testing.assert_allclose(score_b, score_s, rtol=1e-5, atol=1e-5)


def test_beam_beats_greedy_cumlogprob(models):
    """The beam winner's length-normalized score is >= the greedy sequence's
    (sanity: beam search optimizes exactly this objective)."""
    from visrag_tpu.serving.beam import beam_search
    from visrag_tpu.serving.engine import Engine
    from visrag_tpu.serving.sampling import SamplingParams
    ref, model, params = models
    rng = np.random.default_rng(9)
    ids = rng.integers(1, 90, size=(8,)).astype(np.int32)
    seq, score = beam_search(model, params, ids, num_beams=3,
                             max_new_tokens=8)
    eng = Engine(model, params, num_slots=1, max_len=64, prompt_buckets=(16,))
    req = eng.generate_detailed(
        [dict(input_ids=ids)],
        sampling=SamplingParams(temperature=0.0, max_tokens=8))[0]
    greedy_norm = req.cum_logprob / max(len(req.output_ids), 1)
    assert score >= greedy_norm - 1e-4, (score, greedy_norm)


def test_beam1_equals_engine_greedy_with_vision():
    """num_beams=1, rep=1.0 beam search == engine greedy decode, on the
    MiniCPM-V generation model WITH a page image (the weighted-selection
    production path) — validates the dense-cache beam decode against the
    paged engine across model families."""
    import jax.numpy as jnp
    from PIL import Image
    from visrag_tpu.models.minicpmv import (MiniCPMVForGeneration,
                                            MiniCPMVGenConfig)
    from visrag_tpu.preprocess.pipeline import (PipelineConfig,
                                                build_encode_batch)
    from visrag_tpu.preprocess.tokenize import MockTokenizer
    from visrag_tpu.serving.beam import beam_search
    from visrag_tpu.serving.engine import Engine
    from visrag_tpu.serving.sampling import SamplingParams

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
    s = int(arrs["attention_mask"][0].sum())
    ids = arrs["input_ids"][0, :s]
    slot = arrs["slot_map"][0, :s]
    vb = {k: jnp.asarray(arrs[k]) for k in
          ("patches", "patch_mask", "pos_matrix", "grid_h", "grid_w")}
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids[None]),
                        vision_batch=vb, slot_map=jnp.asarray(slot[None]))

    eng = Engine(model, params, num_slots=2, max_len=128,
                 prompt_buckets=(s,))
    req = eng.generate_detailed(
        [dict(input_ids=ids, vision_batch=vb, slot_map=slot)],
        sampling=SamplingParams(temperature=0.0, max_tokens=6))[0]
    seq, score = beam_search(model, params, ids, vision_batch=vb,
                             slot_map=slot, num_beams=1, max_new_tokens=6)
    assert seq == req.output_ids, (seq, req.output_ids)
    np.testing.assert_allclose(score, req.cum_logprob / len(req.output_ids),
                               rtol=1e-3, atol=1e-3)
