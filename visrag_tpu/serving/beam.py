"""Beam search for the weighted-selection generation strategy.

The reference scores each candidate page's answer with HF beam search
(num_beams=3, repetition_penalty=1.2 — weighted_selection/MiniCPMV20/
modeling_minicpmv.py:360-392) and weights exp(sequences_scores) by the
softmaxed retrieval score (:394-424). The engine's continuous-batching decode
is per-slot independent sampling — beams are COUPLED (step-t survivors come
from one top-2k over all beams x vocab), so beam search runs as a dedicated
dense-cache decode: prefill once, broadcast the prompt KV over the k beams,
then a host-driven loop (one jitted (k,)-batched decode step per token) with
HF-parity bookkeeping:

  log_softmax -> repetition penalty (logprob * p on seen tokens, HF
  RepetitionPenaltyLogitsProcessor on post-softmax scores) -> + beam score ->
  top-2k over k*vocab -> EOS candidates ranked < k become finished hypotheses
  (score incl. the EOS logprob, sequence WITHOUT the EOS token) -> first k
  non-EOS candidates continue; done per HF early_stopping=False heuristic
  (worst finished score >= best running sum / generated_len**length_penalty);
  finalize adds running beams when short of k. sequences_scores = sum logprob
  / generated_len**length_penalty (transformers BeamHypotheses.add).

Parity is enforced by tests/test_beam.py A/B against transformers' generate
on a tiny model. Eval-path only: k=3 batches underfill the MXU regardless of
layout and each token fetches a (k, vocab) logprob row — the serving hot path
stays in engine.py.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(4, 5))
def _beam_step(model, params, toks, pos, kc, vc, lengths_incl):
    """One decode step for all k beams on dense per-layer caches."""
    k = toks.shape[0]
    pos3 = jnp.broadcast_to(pos[None, :, None], (3, k, 1))
    logits, kc, vc = model.apply(params, toks[:, None], pos3, kc, vc,
                                 lengths_incl, method=model.decode)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), kc, vc


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _reorder(kc, vc, idx):
    return (tuple(c[idx] for c in kc), tuple(c[idx] for c in vc))


def beam_search(model, params, input_ids, positions=None, *,
                vision_batch=None, slot_map=None, num_beams: int = 3,
                max_new_tokens: int = 64,
                eos_token_ids: Sequence[int] = (),
                length_penalty: float = 1.0,
                repetition_penalty: float = 1.0,
                ) -> Tuple[List[int], float]:
    """→ (best output ids, sequences_score). Greedy beam search with HF
    generate() semantics (see module docstring); the score is the
    length-normalized sum of logprobs the reference exponentiates."""
    input_ids = np.asarray(input_ids, np.int32)
    s = len(input_ids)
    k = num_beams
    eos = set(int(e) for e in eos_token_ids)
    bucket = -(-s // 64) * 64
    ids = np.zeros((1, bucket), np.int32)
    ids[0, :s] = input_ids
    mask = np.zeros((1, bucket), np.int32)
    mask[0, :s] = 1
    if positions is None:
        positions = np.broadcast_to(np.arange(s), (3, s))
    pos = np.zeros((3, 1, bucket), np.int32)
    pos[:, 0, :s] = positions
    vb = {kk: jnp.asarray(v) for kk, v in vision_batch.items()} \
        if vision_batch is not None else None
    sm = None
    if slot_map is not None:
        sm = np.full((1, bucket), -1, np.int32)
        sm[0, :s] = slot_map
        sm = jnp.asarray(sm)
    last, kp, vp = model.apply(params, jnp.asarray(ids),
                               attention_mask=jnp.asarray(mask),
                               positions=jnp.asarray(pos), vision_batch=vb,
                               slot_map=sm,
                               last_pos=jnp.asarray([s - 1]),
                               method=model.prefill)
    kp = np.asarray(kp)          # (layers, 1, bucket, kvh, d)
    layers = kp.shape[0]
    max_len = s + max_new_tokens + 1
    kvh, d = kp.shape[3], kp.shape[4]

    def mk_cache(src):
        c = np.zeros((k, max_len, kvh, d), src.dtype)
        c[:, :s] = src[0, :s]
        return jnp.asarray(c)

    kc = tuple(mk_cache(kp[i]) for i in range(layers))
    vc = tuple(mk_cache(np.asarray(vp)[i]) for i in range(layers))

    logp0 = np.asarray(
        jax.nn.log_softmax(jnp.asarray(last[0], jnp.float32)))
    seen_prompt = np.zeros((logp0.shape[-1],), bool)
    seen_prompt[input_ids] = True

    def penalize(row, seen):
        if repetition_penalty == 1.0:
            return row
        out = row.copy()
        # HF RepetitionPenaltyLogitsProcessor on log-softmax scores:
        # scores are <= 0, so penalized tokens multiply by p
        idx = np.nonzero(seen)[0]
        out[idx] = np.where(out[idx] < 0, out[idx] * repetition_penalty,
                            out[idx] / repetition_penalty)
        return out

    # HF starts with k copies of the prompt and beam_scores [0, -inf...], so
    # step 0 runs the same top-2k candidate selection as every other step
    beam_tokens: List[List[int]] = [[] for _ in range(k)]
    beam_scores = np.full((k,), -1e9, np.float64)
    beam_scores[0] = 0.0
    beam_seen = [seen_prompt.copy() for _ in range(k)]
    finished: List[Tuple[float, float, List[int]]] = []  # (norm, sum, ids)
    base = int(np.max(positions)) + 1     # first generated token's position
    lengths = np.full((k,), s, np.int32)
    toks = None
    stopped_early = False

    for step in range(max_new_tokens):
        if step == 0:
            logp = np.broadcast_to(logp0, (k, logp0.shape[-1]))
        else:
            # input = the tokens selected at step-1, at position
            # base + step - 1; lengths_incl counts them
            logp, kc, vc = _beam_step(
                model, params, toks,
                jnp.full((k,), base + step - 1, jnp.int32),
                kc, vc, jnp.asarray(lengths))
            logp = np.asarray(logp)   # (k, vocab)
        vocab = logp.shape[-1]
        cand = np.empty((k, vocab), np.float64)
        for b in range(k):
            cand[b] = penalize(np.asarray(logp[b]), beam_seen[b]) \
                + beam_scores[b]
        flat = cand.reshape(-1)
        # HF takes max(2, 1 + n_eos) * k candidates so that even if every
        # beam's top pick is an EOS variant, >= k non-EOS survivors remain
        n_cand = max(2, 1 + len(eos)) * k
        order = np.argsort(-flat)[:n_cand]
        next_beams = []      # (parent, token, score_sum)
        for rank, fi in enumerate(order):
            parent, token = divmod(int(fi), vocab)
            score = float(flat[fi])
            if token in eos:
                if rank >= k:
                    continue
                # hypothesis = tokens before the EOS; score includes the
                # EOS logprob; generated_len counts the EOS (HF
                # _beam_search: generated_len = cur_len - prompt_len + 1)
                gen_len = step + 1
                norm = score / (gen_len ** length_penalty)
                finished.append((norm, score, list(beam_tokens[parent])))
            else:
                next_beams.append((parent, token, score))
            if len(next_beams) == k:
                break
        finished.sort(key=lambda x: -x[0])
        finished = finished[:k]
        while len(next_beams) < k:
            # unreachable under the n_cand guarantee unless vocab < n_cand;
            # pad with never-winning beams so the (k,)-batched step holds
            next_beams.append((0, 0, -1e9))

        parents = np.asarray([p for p, _, _ in next_beams], np.int32)
        new_tokens = [t for _, t, _ in next_beams]
        beam_scores = np.asarray([sc for _, _, sc in next_beams], np.float64)
        beam_tokens = [beam_tokens[p] + [t]
                       for p, t in zip(parents, new_tokens)]
        beam_seen = [beam_seen[p].copy() for p in parents]
        for b, t in enumerate(new_tokens):
            beam_seen[b][t] = True
        if step > 0:
            kc, vc = _reorder(kc, vc, jnp.asarray(parents))
        toks = jnp.asarray(new_tokens, jnp.int32)
        lengths = lengths + 1

        # HF early_stopping=False done heuristic
        if len(finished) >= k:
            best_running = float(beam_scores.max())
            gen_len = step + 1
            if min(f[0] for f in finished) >= \
                    best_running / (gen_len ** length_penalty):
                stopped_early = True
                break

    # finalize (HF BeamSearchScorer.finalize): unless the done heuristic
    # fired, ALL running beams join the hypothesis pool and compete on the
    # length-normalized score — a finished-via-EOS hypothesis must not win
    # over a better still-running beam just because it finished
    if not stopped_early:
        for b in range(k):
            gen_len = max(len(beam_tokens[b]), 1)
            norm = float(beam_scores[b]) / (gen_len ** length_penalty)
            finished.append((norm, float(beam_scores[b]),
                             list(beam_tokens[b])))
    finished.sort(key=lambda x: -x[0])
    best = finished[0]
    return best[2], best[0]
