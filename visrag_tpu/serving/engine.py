"""TPU inference engine: prefill + batched decode with continuous batching.

Replaces vLLM's role in the reference (EVisRAG predict.py:112-117, RS-GRPO
rollout vllm_rollout_spmd.py): a single-controller JAX engine where

  * prefill runs the full model once per request (bucketed prompt lengths →
    a handful of compiled programs) and writes K/V into the slot cache;
  * decode runs ONE jitted step for all active slots (continuous batching:
    finished slots are refilled from the queue between steps);
  * weights are the same arrays the trainer uses — the reference's
    FSDP→vLLM weight-sync protocol (fsdp_vllm.py:110-138) becomes a no-op.

The engine is model-agnostic over a small protocol: model.prefill(...) and
model.decode(...) as implemented by models.qwen25_vl.Qwen25VL.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import SamplingParams, sample


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


@dataclasses.dataclass
class Request:
    request_id: int
    input_ids: np.ndarray            # (S,) prompt token ids
    positions: np.ndarray            # (3, S) mrope ids (or None → 1-D)
    vision_batch: Optional[dict] = None
    slot_map: Optional[np.ndarray] = None
    sampling: SamplingParams = dataclasses.field(default_factory=SamplingParams)
    # filled by the engine:
    output_ids: List[int] = dataclasses.field(default_factory=list)
    cum_logprob: float = 0.0
    done: bool = False


class Engine:
    """Continuous-batching engine over a fixed number of decode slots."""

    def __init__(self, model, params, *, num_slots: int = 8,
                 max_len: int = 4096, prompt_buckets: Sequence[int] = (512, 1024, 2048, 4096),
                 eos_token_ids: Sequence[int] = (),
                 cache_dtype=jnp.bfloat16):
        self.model = model
        self.params = params
        self.num_slots = num_slots
        self.max_len = max_len
        self.prompt_buckets = [b for b in prompt_buckets if b <= max_len]
        self.eos = set(int(e) for e in eos_token_ids)
        tc = model.cfg.text
        self.k_cache = jnp.zeros((tc.num_hidden_layers, num_slots, max_len,
                                  tc.num_key_value_heads, tc.head_dim),
                                 cache_dtype)
        self.v_cache = jnp.zeros_like(self.k_cache)
        self.lengths = np.zeros((num_slots,), np.int32)
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self.queue: List[Request] = []
        self._next_id = 0

        self._prefill_jit = jax.jit(
            lambda p, ids, pos, mask, vb, sm: model.apply(
                p, ids, attention_mask=mask, positions=pos, vision_batch=vb,
                slot_map=sm, method=model.prefill))
        self._decode_jit = jax.jit(
            lambda p, tok, pos, kc, vc, ln: model.apply(
                p, tok, pos, kc, vc, ln, method=model.decode))

    # ---- request management ------------------------------------------

    def add_request(self, input_ids, positions=None, vision_batch=None,
                    slot_map=None,
                    sampling: Optional[SamplingParams] = None) -> int:
        rid = self._next_id
        self._next_id += 1
        input_ids = np.asarray(input_ids, np.int32)
        if positions is None:
            positions = np.broadcast_to(np.arange(len(input_ids)),
                                        (3, len(input_ids)))
        self.queue.append(Request(rid, input_ids, np.asarray(positions),
                                  vision_batch=vision_batch,
                                  slot_map=slot_map,
                                  sampling=sampling or SamplingParams()))
        return rid

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self.slot_req) if r is None]

    # ---- prefill -----------------------------------------------------

    def _prefill_one(self, req: Request, slot: int, rng) -> int:
        s = len(req.input_ids)
        bucket = _bucket(s, self.prompt_buckets)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :s] = req.input_ids
        pos = np.zeros((3, 1, bucket), np.int32)
        pos[:, 0, :s] = req.positions
        mask = np.zeros((1, bucket), np.int32)
        mask[0, :s] = 1
        vb = None
        sm = None
        if req.vision_batch is not None:
            vb = {k: jnp.asarray(v) for k, v in req.vision_batch.items()}
            sm = np.full((1, bucket), -1, np.int32)
            sm[0, :s] = req.slot_map
            sm = jnp.asarray(sm)
        logits, k, v = self._prefill_jit(self.params, jnp.asarray(ids),
                                         jnp.asarray(pos), jnp.asarray(mask),
                                         vb, sm)
        # write prompt K/V into the slot
        self.k_cache = jax.lax.dynamic_update_slice(
            self.k_cache, k[:, 0][:, None, :bucket].astype(self.k_cache.dtype),
            (0, slot, 0, 0, 0))
        self.v_cache = jax.lax.dynamic_update_slice(
            self.v_cache, v[:, 0][:, None, :bucket].astype(self.v_cache.dtype),
            (0, slot, 0, 0, 0))
        self.lengths[slot] = s
        self.slot_req[slot] = req

        # first generated token from the last prompt position
        last_logits = logits[0, s - 1][None]
        seen = self._seen_mask([req])
        tok = int(np.asarray(sample(last_logits, rng, req.sampling, seen))[0])
        self._accumulate_logprob([req], np.asarray(last_logits), [tok])
        self._append_token(req, slot, tok)
        return tok

    def _seen_mask(self, reqs: Sequence[Request]):
        vocab = (self.model.cfg.text.vocab_size)
        m = np.zeros((len(reqs), vocab), bool)
        for i, r in enumerate(reqs):
            m[i, np.asarray(r.input_ids) % vocab] = True
            if r.output_ids:
                m[i, np.asarray(r.output_ids, np.int64) % vocab] = True
        return jnp.asarray(m)

    def _accumulate_logprob(self, reqs, logits, toks):
        """Track Σ log p(token) per request (sequence scores for the
        weighted-selection strategy, reference weighted_selection/...:394-424)."""
        logits = np.asarray(logits, np.float64)
        mx = logits.max(-1)
        logz = np.log(np.sum(np.exp(logits - mx[:, None]), axis=-1)) + mx
        for j, (r, t) in enumerate(zip(reqs, toks)):
            r.cum_logprob += float(logits[j, int(t)] - logz[j])

    def _append_token(self, req: Request, slot: int, tok: int):
        req.output_ids.append(tok)
        if tok in self.eos or len(req.output_ids) >= req.sampling.max_tokens \
                or self.lengths[slot] + 1 >= self.max_len:
            req.done = True

    # ---- decode ------------------------------------------------------

    def _decode_step(self, rng):
        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return
        toks = np.zeros((self.num_slots, 1), np.int32)
        pos = np.zeros((3, self.num_slots, 1), np.int32)
        for i in active:
            r = self.slot_req[i]
            toks[i, 0] = r.output_ids[-1]
            # text positions advance uniformly past the prompt's max position
            base = int(r.positions.max()) + len(r.output_ids)
            pos[:, i, 0] = base
        lengths_incl = jnp.asarray(self.lengths + 1)
        logits, k_new, v_new = self._decode_jit(
            self.params, jnp.asarray(toks), jnp.asarray(pos),
            self.k_cache, self.v_cache, lengths_incl)
        # write new K/V at each slot's current length
        idx = jnp.arange(self.num_slots)
        self.k_cache = self.k_cache.at[:, idx, jnp.asarray(self.lengths)].set(
            k_new.astype(self.k_cache.dtype))
        self.v_cache = self.v_cache.at[:, idx, jnp.asarray(self.lengths)].set(
            v_new.astype(self.v_cache.dtype))

        reqs = [self.slot_req[i] for i in active]
        seen = self._seen_mask(reqs)
        sampling = reqs[0].sampling  # per-batch params (engine-level contract)
        active_logits = np.asarray(logits)[active]
        toks_new = np.asarray(sample(jnp.asarray(active_logits),
                                     rng, sampling, seen))
        self._accumulate_logprob(reqs, active_logits, toks_new.tolist())
        for j, i in enumerate(active):
            self.lengths[i] += 1
            self._append_token(self.slot_req[i], i, int(toks_new[j]))
        # retire finished
        for i in active:
            if self.slot_req[i] is not None and self.slot_req[i].done:
                self.lengths[i] = 0
                self.slot_req[i] = None

    # ---- main loop ---------------------------------------------------

    def run(self, rng=None) -> Dict[int, List[int]]:
        """Drain the queue; returns {request_id: output token ids}."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        results: Dict[int, List[int]] = {}
        pending = {r.request_id: r for r in self.queue}
        while self.queue or any(r is not None for r in self.slot_req):
            # fill free slots
            while self.queue and self._free_slots():
                rng, r1 = jax.random.split(rng)
                req = self.queue.pop(0)
                self._prefill_one(req, self._free_slots()[0], r1)
            rng, r2 = jax.random.split(rng)
            self._decode_step(r2)
            for rid, r in list(pending.items()):
                if r.done:
                    results[rid] = r.output_ids
                    del pending[rid]
        return results

    def generate(self, prompts: Sequence[dict],
                 sampling: Optional[SamplingParams] = None,
                 rng=None) -> List[List[int]]:
        """prompts: dicts with input_ids [+ positions, vision_batch,
        slot_map]. Returns outputs in order."""
        ids = [self.add_request(sampling=sampling, **p) for p in prompts]
        results = self.run(rng)
        return [results[i] for i in ids]
