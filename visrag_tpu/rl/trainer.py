"""RS-GRPO trainer: the single-controller RL loop.

Replaces the reference's Ray/FSDP/vLLM machinery (verl/trainer/ray_trainer.py
:560-704, workers/fsdp_workers.py, rollout/vllm_rollout_spmd.py) with one JAX
process:

  rollout (serving.Engine, n samples/prompt)
    → rewards (host: 6 scoped channels, rl/rewards.py)
    → ROUTER/GRPO advantage (rl/advantage.py)
    → dual-clip PPO with reward-scoped masks (rl/ppo.py) under jit
    → optax update.

The FSDP↔vLLM weight handoff (fsdp_vllm.py:110-138) disappears: the engine
and the train step share the same param arrays; after each update the engine
just reads the new pytree. Online filtering + batch regeneration follows
ray_trainer._make_batch_data (:467-558); seqlen balancing rl/seqlen.py.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import RLConfig
from ..serving.engine import Engine
from ..serving.sampling import SamplingParams
from .advantage import compute_advantage
from .ppo import log_probs_from_logits, ppo_loss
from .rewards import REWARD_CHANNELS, build_reward_masks, compute_rewards
from .seqlen import reorder_for_dp


@dataclasses.dataclass
class RolloutBatch:
    """The in-memory pytree replacing verl's DataProto RPC payload
    (protocol.py): plain arrays, no wire format needed under a single
    controller."""
    input_ids: np.ndarray        # (bs, S) prompt+response, right-padded
    attention_mask: np.ndarray   # (bs, S)
    positions: np.ndarray        # (3, bs, S)
    response_mask: np.ndarray    # (bs, S) 1 on response tokens
    responses: List[List[int]]
    response_texts: List[str]
    uid: np.ndarray              # (bs,) prompt group ids
    ground_truths: List[str]


class RLTrainer:
    def __init__(self, model, params, cfg: RLConfig, *,
                 tokenizer_decode: Callable[[Sequence[int]], str],
                 tag_token_ids: Dict[str, Sequence[int]],
                 eos_token_ids: Sequence[int] = (),
                 engine_kwargs: Optional[dict] = None,
                 ref_params=None):
        self.model = model
        self.cfg = cfg
        self.params = params
        self.ref_params = ref_params
        self.decode = tokenizer_decode
        self.tag_token_ids = tag_token_ids
        self.eos = tuple(eos_token_ids)
        self.engine_kwargs = dict(num_slots=8, max_len=4096,
                                  prompt_buckets=(512, 1024, 2048, 4096))
        self.engine_kwargs.update(engine_kwargs or {})

        schedule = cfg.actor.lr
        self.tx = optax.chain(optax.clip_by_global_norm(cfg.actor.grad_clip),
                              optax.adamw(schedule, weight_decay=1e-2))
        self.opt_state = self.tx.init(params["params"])
        self.step = 0
        self._logp_jit = jax.jit(self._logp_fn)
        self._train_jit = jax.jit(self._train_step)

    # ---- jitted pieces -----------------------------------------------

    def _logp_fn(self, params, input_ids, attention_mask, positions,
                 response_mask):
        logits, _ = self.model.apply(params, input_ids,
                                     attention_mask=attention_mask,
                                     positions=positions)
        labels = jnp.roll(input_ids, -1, axis=1)
        logp = log_probs_from_logits(logits[:, :-1], labels[:, :-1])
        logp = jnp.concatenate([logp, jnp.zeros_like(logp[:, :1])], axis=1)
        # logp[t] = log p(token at t+1 | ...); response_mask marks generated
        # tokens, so shift: contribution of token t is at position t-1
        shifted = jnp.roll(response_mask, -1, axis=1)
        return logp * shifted

    def _train_step(self, params, opt_state, batch):
        def loss_fn(p):
            logp = self._logp_fn({"params": p}, batch["input_ids"],
                                 batch["attention_mask"], batch["positions"],
                                 batch["response_mask"])
            ref_logp = batch.get("ref_log_probs")
            loss, metrics = ppo_loss(
                batch["old_log_probs"], logp, batch["advantages"],
                batch["response_mask"], batch["reward_masks"],
                ref_log_probs=ref_logp, kl_coef=self.cfg.actor.kl_coef,
                kl_type=self.cfg.actor.kl_type,
                clip_ratio_low=self.cfg.actor.clip_ratio_low,
                clip_ratio_high=self.cfg.actor.clip_ratio_high,
                clip_ratio_dual=self.cfg.actor.clip_ratio_dual)
            return loss, metrics
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        # non-finite grad skip (reference dp_actor.py:163-165)
        ok = jnp.isfinite(gnorm)
        updates, new_opt = self.tx.update(
            jax.tree_util.tree_map(lambda g: jnp.where(ok, g, 0.0), grads),
            opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params)
        metrics = dict(metrics, loss=loss, grad_norm=gnorm,
                       grad_skipped=1.0 - ok.astype(jnp.float32))
        return params, new_opt, metrics

    # ---- rollout → batch ---------------------------------------------

    def rollout(self, prompts: List[dict], rng) -> RolloutBatch:
        """prompts: dicts with input_ids (+positions, vision_batch, slot_map,
        ground_truth). Each prompt sampled cfg.rollout.n times."""
        n = self.cfg.rollout.n
        eng = Engine(self.model, self.params, eos_token_ids=self.eos,
                     **self.engine_kwargs)
        sampling = SamplingParams(
            temperature=self.cfg.rollout.temperature,
            top_p=self.cfg.rollout.top_p,
            max_tokens=self.cfg.rollout.max_response_length)
        expanded = []
        uids = []
        gts = []
        for ui, p in enumerate(prompts):
            for _ in range(n):
                expanded.append({k: v for k, v in p.items()
                                 if k != "ground_truth"})
                uids.append(ui)
                gts.append(p.get("ground_truth", ""))
        outs = eng.generate(expanded, sampling=sampling, rng=rng)

        max_len = max(len(p["input_ids"]) + len(o)
                      for p, o in zip(expanded, outs))
        max_len = -(-max_len // 128) * 128
        bs = len(expanded)
        input_ids = np.zeros((bs, max_len), np.int32)
        mask = np.zeros((bs, max_len), np.int32)
        rmask = np.zeros((bs, max_len), np.int32)
        positions = np.zeros((3, bs, max_len), np.int32)
        texts = []
        for i, (p, o) in enumerate(zip(expanded, outs)):
            pl = len(p["input_ids"])
            full = np.concatenate([p["input_ids"], np.asarray(o, np.int32)])
            input_ids[i, :len(full)] = full
            mask[i, :len(full)] = 1
            rmask[i, pl:len(full)] = 1
            ppos = p.get("positions")
            if ppos is None:
                ppos = np.broadcast_to(np.arange(pl), (3, pl))
            positions[:, i, :pl] = ppos
            base = int(np.max(ppos)) + 1
            positions[:, i, pl:len(full)] = base + np.arange(len(full) - pl)
            texts.append(self.decode(o))
        return RolloutBatch(input_ids=input_ids, attention_mask=mask,
                            positions=positions, response_mask=rmask,
                            responses=outs, response_texts=texts,
                            uid=np.asarray(uids), ground_truths=gts)

    def make_batch(self, prompts: List[dict], rng) -> Optional[dict]:
        """Rollout + rewards + advantage (+ online filtering with
        regeneration, ray_trainer._make_batch_data :467-558)."""
        alg = self.cfg.algorithm
        collected: List[dict] = []
        tries = 0
        pool = list(prompts)
        while True:
            tries += 1
            rng, r1 = jax.random.split(rng)
            rb = self.rollout(pool, r1)
            reward_tensor, metrics = compute_rewards(
                rb.response_texts, rb.ground_truths,
                [len(r) for r in rb.responses],
                max_response_length=self.cfg.rollout.max_response_length)
            keep_uids = set(rb.uid.tolist())
            if alg.online_filtering:
                ch = REWARD_CHANNELS.index(alg.filter_key)
                keep_uids = set()
                for uid in np.unique(rb.uid):
                    sel = rb.uid == uid
                    m = reward_tensor[sel, ch].mean()
                    if alg.filter_low < m < alg.filter_high:
                        keep_uids.add(int(uid))
            collected.append(self._finalize(rb, reward_tensor, keep_uids))
            total = sum(c["input_ids"].shape[0] for c in collected if c)
            if total >= self.cfg.trainer.rollout_batch_size * self.cfg.rollout.n \
                    or not alg.online_filtering or tries >= alg.max_try_make_batch:
                break
        parts = [c for c in collected if c is not None]
        if not parts:
            return None
        # pad every part to the max sequence length before concatenating
        S = max(p["input_ids"].shape[1] for p in parts)

        def pad_part(p):
            out = {}
            for k, v in p.items():
                if k in ("input_ids", "attention_mask", "response_mask"):
                    out[k] = np.pad(v, ((0, 0), (0, S - v.shape[1])))
                elif k == "positions":
                    out[k] = np.pad(v, ((0, 0), (0, 0), (0, S - v.shape[2])))
                elif k == "reward_masks":
                    out[k] = np.pad(v, ((0, 0), (0, 0), (0, S - v.shape[2])))
                else:
                    out[k] = v
            return out

        parts = [pad_part(p) for p in parts]
        return {k: np.concatenate([p[k] for p in parts],
                                  axis=1 if k == "positions" else 0)
                for k in parts[0]}

    def _finalize(self, rb: RolloutBatch, reward_tensor, keep_uids):
        keep = np.asarray([u in keep_uids for u in rb.uid])
        if not keep.any():
            return None
        sel = np.nonzero(keep)[0]
        resp_ids = []
        max_resp = max(len(rb.responses[i]) for i in sel)
        resp_arr = np.zeros((len(sel), max_resp), np.int32)
        resp_m = np.zeros((len(sel), max_resp), np.int32)
        for j, i in enumerate(sel):
            r = rb.responses[i]
            resp_arr[j, :len(r)] = r
            resp_m[j, :len(r)] = 1
        reward_masks_resp = build_reward_masks(resp_arr, resp_m,
                                               self.tag_token_ids)
        # lift response-relative masks onto the full sequence layout
        bs, S = rb.input_ids[sel].shape
        reward_masks = np.zeros((bs, len(REWARD_CHANNELS), S), np.int32)
        for j, i in enumerate(sel):
            pl = int(np.sum(rb.attention_mask[i]) - np.sum(rb.response_mask[i]))
            n = int(resp_m[j].sum())
            reward_masks[j, :, pl:pl + n] = reward_masks_resp[j, :, :n]

        adv, _ = compute_advantage(
            self.cfg.algorithm.adv_estimator,
            reward_tensor=reward_tensor[sel],
            token_rewards=None, response_mask=rb.response_mask[sel],
            index=rb.uid[sel])
        return dict(input_ids=rb.input_ids[sel],
                    attention_mask=rb.attention_mask[sel],
                    positions=rb.positions[:, sel],
                    response_mask=rb.response_mask[sel],
                    reward_masks=reward_masks,
                    reward_tensor=reward_tensor[sel],
                    advantages=adv, uid=rb.uid[sel])

    # ---- outer loop --------------------------------------------------

    def fit(self, prompt_iter, rng=None,
            logger: Optional[Callable[[int, dict], None]] = None):
        """prompt_iter yields lists of prompt dicts (one rollout batch)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        history = []
        for prompts in prompt_iter:
            t0 = time.time()
            rng, r1, r2 = jax.random.split(rng, 3)
            batch = self.make_batch(prompts, r1)
            if batch is None:
                continue
            # old log probs under the current (pre-update) policy
            old_logp = np.asarray(self._logp_jit(
                self.params, jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
                jnp.asarray(batch["positions"]),
                jnp.asarray(batch["response_mask"])))
            train_batch = {
                "input_ids": jnp.asarray(batch["input_ids"]),
                "attention_mask": jnp.asarray(batch["attention_mask"]),
                "positions": jnp.asarray(batch["positions"]),
                "response_mask": jnp.asarray(batch["response_mask"]),
                "reward_masks": jnp.asarray(batch["reward_masks"]),
                "advantages": jnp.asarray(batch["advantages"]),
                "old_log_probs": jnp.asarray(old_logp),
            }
            if self.ref_params is not None and self.cfg.actor.kl_coef > 0:
                train_batch["ref_log_probs"] = self._logp_jit(
                    self.ref_params, train_batch["input_ids"],
                    train_batch["attention_mask"], train_batch["positions"],
                    train_batch["response_mask"])
            for _ in range(self.cfg.actor.ppo_epochs):
                self.params["params"], self.opt_state, metrics = \
                    self._train_jit(self.params["params"], self.opt_state,
                                    train_batch)
                self.params = {"params": self.params["params"]}
            self.step += 1
            m = {k: float(v) for k, v in metrics.items()}
            m["reward_mean"] = float(batch["reward_tensor"].sum(-1).mean())
            m["step_time_s"] = time.time() - t0
            history.append((self.step, m))
            if logger:
                logger(self.step, m)
            if 0 < self.cfg.trainer.total_steps <= self.step:
                break
        return history
