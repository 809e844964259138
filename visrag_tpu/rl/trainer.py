"""RS-GRPO trainer: the single-controller, mesh-sharded RL loop.

Replaces the reference's Ray/FSDP/vLLM machinery (verl/trainer/ray_trainer.py
:560-704, workers/fsdp_workers.py, actor/dp_actor.py:219-302,
rollout/vllm_rollout_spmd.py) with one JAX process:

  rollout (serving.Engine, n samples/prompt, persistent across steps)
    → rewards (host: 6 scoped channels, rl/rewards.py)
    → online filtering pulling FRESH prompt groups per retry with globally
      unique uids (ray_trainer._make_batch_data :467-558)
    → ROUTER/GRPO advantage (rl/advantage.py)
    → seqlen-balanced reorder across dp shards (ray_trainer._balance_batch
      :450-465) → minibatch / token-budget micro-batch loops with dual-clip
      PPO under jit (dp_actor.update_policy :219-302).

Distribution is GSPMD, not RPC: params are FSDP-sharded over the mesh `data`
axis (mesh.shard_params_fsdp), batches are sharded on dim 0, and the
reference's `dist.all_reduce(total_response_tokens)` (dp_actor.py:237-238)
is simply a jnp.sum over the logically-global minibatch — XLA inserts the
collectives. The FSDP↔vLLM weight handoff (fsdp_vllm.py:110-138) disappears:
one Engine persists across steps and reads the updated param pytree.

Token alignment: log-probs live at position t for the token generated at
t+1 (the label shift), so the update path shifts response/reward masks into
the same space — ratio, advantage scope, and token counts all refer to the
same generated token, matching the reference's response-relative layout
(dp_actor._forward_micro_batch returns per-response-token log-probs).

Padding-free: text micro-batches run packed (segment-id flash attention,
rl/packing.py) — the TPU equivalent of the reference's flash-attn varlen
unpad path (dp_actor.py:89-141). Micro-batches carrying vision inputs fall
back to the padded layout.
"""

from __future__ import annotations

import dataclasses
import time
from collections import defaultdict
from typing import (Callable, Dict, Iterable, Iterator, List, Optional,
                    Sequence, Tuple)

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import RLConfig
from ..mesh import DATA, MODEL, REPLICA, shard_params_fsdp
from ..serving.engine import Engine
from ..serving.sampling import SamplingParams
from .advantage import compute_advantage
from .packing import pack_sequences
from .ppo import chunked_token_log_probs, ppo_loss
from .reward_manager import RewardManager
from .rewards import build_reward_masks
from .seqlen import reorder_for_dp, token_budget_micro_batches

# batch keys indexed by row (dim 0); "positions" is (3, bs, S) → dim 1
_ROW_KEYS = ("input_ids", "attention_mask", "response_mask", "reward_masks",
             "advantages", "old_log_probs", "ref_log_probs", "reward_tensor",
             "uid", "slot_map", "values", "returns", "reward_baselines")


def _reindex(batch: Dict[str, np.ndarray], idx) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in batch.items():
        if k == "positions":
            out[k] = v[:, idx]
        elif k in _ROW_KEYS:
            out[k] = v[idx]
        else:
            out[k] = v
    return out


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
    uid: np.ndarray              # (bs,) prompt group ids (globally unique)
    ground_truths: List[str]
    # multimodal: ONE combined vision table for the whole rollout + per-row
    # flat slot maps into it (-1 = text position); None for text-only
    vision: Optional[dict] = None
    slot_map: Optional[np.ndarray] = None


class RLTrainer:
    def __init__(self, model, params, cfg: RLConfig, *,
                 tokenizer_decode: Callable[[Sequence[int]], str],
                 tag_token_ids: Dict[str, Sequence[int]],
                 eos_token_ids: Sequence[int] = (),
                 engine_kwargs: Optional[dict] = None,
                 ref_params=None, mesh=None, critic=None,
                 rollout_model=None,
                 banned_token_ids: Sequence[int] = (),
                 tokenizer_batch_decode: Optional[
                     Callable[[Sequence[Sequence[int]]], List[str]]] = None,
                 reward_manager: Optional[RewardManager] = None):
        self.model = model
        # rollout_model: same architecture/params for the Engine, typically
        # the remat=False variant — inference needs no rematerialization and
        # flax nn.remat rejects the prefill's return_kv control kwarg.
        # None → the training model (fine when it doesn't remat).
        self.rollout_model = rollout_model if rollout_model is not None \
            else model
        self.cfg = cfg
        self.mesh = mesh
        # critic: rl.critic.CriticTrainer, required for adv_estimator "gae"
        self.critic = critic
        alg = cfg.algorithm
        self.kl_ctrl = None
        if ref_params is not None and not alg.use_kl_loss:
            if alg.adv_estimator == "router":
                raise ValueError(
                    "the reward-side KL penalty (use_kl_loss=False with "
                    "ref_params) is wired for gae/grpo/rloo/"
                    "reinforce_plus_plus — the router estimator works on "
                    "per-channel scalar rewards; use use_kl_loss=True "
                    "(in-loss KL) with router instead")
            from .ppo import get_kl_controller
            self.kl_ctrl = get_kl_controller(alg.kl_type, alg.kl_coef,
                                             alg.kl_target, alg.kl_horizon)
        self.dp = 1 if mesh is None else (mesh.shape[REPLICA] *
                                          mesh.shape[DATA])
        # Hybrid engine (reference fsdp_workers.py:331-350: rollout on a
        # (dp, tp) mesh): a mesh `model` axis > 1 runs the rollout Engine
        # tensor-parallel while update/logp stay FSDP over `data`. The
        # per-step weight handoff is Engine.set_params — a resharding
        # device_put from the FSDP layout to the Megatron TP layout (the
        # "resharding pjit, not a copy protocol" of SURVEY §7.1-7). This is
        # what lets 7B+ RS-GRPO actors serve their own rollouts on 16 GB
        # chips (weights alone exceed one chip at bf16).
        self.tp = 1 if mesh is None else int(dict(mesh.shape).get(MODEL, 1))
        # Ulysses SP: mesh seq axis > 1 runs the update/logp forwards
        # sequence-parallel (cfg.actor.ulysses_size sizes the mesh axis in
        # driver/rl_main; reference fsdp_workers.py:119-129)
        self.sp = 1 if mesh is None else int(dict(mesh.shape).get("seq", 1))
        if cfg.actor.ulysses_size > 1 and self.sp != cfg.actor.ulysses_size:
            raise ValueError(
                f"actor.ulysses_size={cfg.actor.ulysses_size} but the mesh "
                f"seq axis is {self.sp} — size the mesh with "
                "MeshConfig(seq=ulysses_size)")
        if mesh is not None:
            params = {"params": shard_params_fsdp(params["params"], mesh)}
            if ref_params is not None:
                ref_params = {"params": shard_params_fsdp(
                    ref_params["params"], mesh)}
        self.params = params
        self.ref_params = ref_params
        self.decode = tokenizer_decode
        # ONE host call decodes the whole rollout (HF batch_decode) instead
        # of bs×n serial per-sample decodes — the rollout host loop is
        # serial Python at rollout_batch_size×n=256 with 1.5k-token
        # responses (VERDICT round-3 weak #5)
        self.batch_decode = tokenizer_batch_decode if \
            tokenizer_batch_decode is not None else \
            (lambda seqs: [tokenizer_decode(s) for s in seqs])
        # pluggable rewards (reference FunctionRewardManager,
        # function.py:47-105): cfg.reward.reward_function importlib-loads a
        # user scorer; None = in-tree evidencecot. The manager owns the
        # channel list + token-span table consumed everywhere below.
        self.reward_manager = reward_manager if reward_manager is not None \
            else RewardManager(
                cfg.reward,
                max_response_length=cfg.rollout.max_response_length)
        self.channels = self.reward_manager.channels
        missing_tags = self.reward_manager.required_tags - set(tag_token_ids)
        if missing_tags:
            raise ValueError(
                f"tag_token_ids is missing encodings for span tags "
                f"{sorted(missing_tags)} required by the reward channels — "
                "encode them with the tokenizer (add_special_tokens=False)")
        self.tag_token_ids = tag_token_ids
        self.eos = tuple(eos_token_ids)
        # rollout sampling bans these ids via logit bias -100 — the
        # reference bans the image token in every rollout so responses can
        # never contain `<image>` (vllm_rollout_spmd.py:42-49,132);
        # driver/rl_main passes the processor's image token id
        from ..serving.sampling import banned_ids_bias
        self.logit_bias = banned_ids_bias(banned_token_ids)
        self.engine_kwargs = dict(num_slots=8, max_len=4096,
                                  prompt_buckets=(512, 1024, 2048, 4096))
        self.engine_kwargs.update(engine_kwargs or {})
        self._engine: Optional[Engine] = None
        self._uid_next = 0
        # optional data.StatefulIterator over prompt batches: its cursor +
        # the fit loop's rng ride in checkpoints so resume consumes the
        # exact same batch sequence (StatefulDataLoader role,
        # ray_trainer.py:332-334, 368-373)
        self.data_iter = None
        self._rng = None

        from ..training.optim import (adamw_from_config,
                                      constant_schedule_with_warmup,
                                      resolve_warmup_steps)
        a = cfg.actor
        lr = constant_schedule_with_warmup(
            a.lr, resolve_warmup_steps(a.lr_warmup_steps, a.lr_warmup_ratio,
                                       cfg.trainer.total_steps))
        self.tx = optax.chain(
            optax.clip_by_global_norm(a.grad_clip),
            adamw_from_config(lr, weight_decay=a.weight_decay,
                              b1=a.betas[0], b2=a.betas[1],
                              state_dtype=a.optimizer_state_dtype))
        # the reference freezes the tower via requires_grad
        # (fsdp_workers.py:228-238); here the frozen subtree is EXCLUDED
        # from differentiation entirely — value_and_grad runs over the
        # trainable top-level keys only, with the frozen leaves passed as a
        # non-differentiated argument. This is stronger than a masked
        # optimizer: no zero-grad tree for the tower is ever materialized
        # (a 0.67B bf16 tower costs ~1.3 GB of structural zeros per grad
        # tree — the single-chip multimodal OOM line), no weight-decay
        # drift, and the optimizer never sees the frozen leaves at all.
        self._frozen_keys = tuple(
            k for k in ("visual", "vpm") if k in params["params"]
        ) if cfg.actor.freeze_vision_tower else ()
        # host-offload of the frozen subtree (see ActorConfig docstring):
        # device leaves swap for a once-downloaded host copy after the
        # vision_embed phase and come back at the next rollout()
        self._offload = (bool(cfg.actor.offload_frozen_params)
                         and bool(self._frozen_keys))
        self._frozen_host = None
        # the ref policy's frozen tower is never consulted: ref logp
        # consumes the vision_embeds table precomputed from the actor's
        # IDENTICAL frozen tower (freeze_vision_tower is required for
        # vision RL) — drop the copy so a full-ref checkpoint doesn't
        # duplicate 1.34 GB of tower weights
        if self.ref_params is not None and self._frozen_keys:
            self.ref_params = {"params": {
                k: v for k, v in self.ref_params["params"].items()
                if k not in self._frozen_keys}}
        # host-offload the ref policy between its once-per-step logp phase
        # (the reference ref worker's param_offload role,
        # fsdp_workers.py ref_policy cpu_offload): a 1.5B bf16 ref copy is
        # 2.87 GiB of HBM ballast during rollout/update
        self._offload_ref = (bool(cfg.actor.offload_ref_params)
                             and self.ref_params is not None)
        if self._offload_ref:
            if mesh is not None:
                raise ValueError(
                    "offload_ref_params is single-host: mesh shardings "
                    "are not preserved through the host round-trip — "
                    "shard the ref with FSDP instead (mesh=...)")
            self.ref_params = jax.device_get(self.ref_params)
        self.opt_state = self.tx.init(
            self._split_params(params["params"])[0])
        self.step = 0
        self._vision_jit = None
        self._logp_jit = jax.jit(self._logp_fn)
        self._grad_jit = jax.jit(self._grad_fn)
        self._grad_packed_jit = jax.jit(self._grad_packed_fn)
        # micro-batch accumulation FUSED into the grad program with a
        # donated accumulator: a separate add kept accumulator + fresh
        # tree live simultaneously (2 full param-sized trees — the OOM
        # line of the 1.5B single-chip bench); fused, XLA folds each
        # leaf's grad into the donated buffer as the backward emits it
        self._grad_acc_jit = jax.jit(
            lambda p, f, b, t, acc: self._acc(self._grad_fn(p, f, b, t),
                                              acc),
            donate_argnums=(4,))
        self._grad_packed_acc_jit = jax.jit(
            lambda p, f, b, t, acc: self._acc(
                self._grad_packed_fn(p, f, b, t), acc),
            donate_argnums=(4,))
        self._apply_jit = jax.jit(self._apply_fn, donate_argnums=(0, 1, 2))

    def _split_params(self, p):
        """→ (trainable subtree, frozen subtree) by top-level key."""
        if not self._frozen_keys:
            return p, {}
        return ({k: v for k, v in p.items() if k not in self._frozen_keys},
                {k: v for k, v in p.items() if k in self._frozen_keys})

    def _offload_frozen(self):
        """Swap the frozen tower's device leaves for a host copy, freeing
        their HBM through the logp/adv/update phases (which consume the
        precomputed `vision_embeds` table, never the tower). The download
        happens ONCE — frozen params never change — so repeat offloads
        just drop device references. ~1.34 GB for the 0.67B Qwen ViT
        (measured effect at the 14.8k/5-image reference geometry: moves
        the OOM wall from the grad pass into the optimizer apply —
        BASELINE.md round-5)."""
        p = self.params["params"]
        on_dev = [k for k in self._frozen_keys
                  if isinstance(jax.tree_util.tree_leaves(p[k])[0],
                                jax.Array)]
        if not on_dev:
            return
        if self._frozen_host is None:
            self._frozen_host = {k: jax.device_get(p[k])
                                 for k in self._frozen_keys}
        for k in self._frozen_keys:
            p[k] = self._frozen_host[k]

    def _restore_frozen(self):
        """Re-upload offloaded frozen leaves before rollout/vision_embed."""
        p = self.params["params"]
        for k in self._frozen_keys:
            if not isinstance(jax.tree_util.tree_leaves(p[k])[0],
                              jax.Array):
                p[k] = jax.device_put(p[k])

    # ---- device placement ---------------------------------------------

    def _put(self, x, batch_dim: Optional[int] = 0):
        """Shard dim `batch_dim` over (replica, data); None = replicate."""
        x = jnp.asarray(x)
        if self.mesh is None:
            return x
        spec = [None] * x.ndim
        if batch_dim is not None and x.shape[batch_dim] % self.dp == 0:
            spec[batch_dim] = (REPLICA, DATA)
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    def _put_batch(self, batch: Dict[str, np.ndarray]):
        # vision_batch is a DICT of tables (pixels/grids) — replicate its
        # leaves; jnp.asarray on the dict itself would raise
        return {k: ({kk: self._put(vv, None) for kk, vv in v.items()}
                    if isinstance(v, dict)
                    else self._put(v, 1 if k == "positions" else 0))
                for k, v in batch.items()}

    def _row_bucket(self, n: int) -> int:
        """Round a micro-batch row count up to dp·2^k to bound recompiles."""
        b = max(self.dp, 1)
        while b < n:
            b *= 2
        return b

    # ---- jitted pieces -------------------------------------------------

    @staticmethod
    def _vision_kwargs(batch):
        return {k: batch[k] for k in ("vision_batch", "slot_map",
                                      "vision_embeds") if k in batch}

    @property
    def _sp_mesh(self):
        return self.mesh if self.sp > 1 else None

    def _token_logp(self, params_tree, hidden, input_ids):
        """(B, S, H) hidden → (B, S-1) label log-probs via the chunked
        fused linear+CE (never materializes (B, S, V) — at 15k tokens the
        full-seq f32 logits buffer is ~20 GB and cannot compile)."""
        labels = jnp.roll(input_ids, -1, axis=1)
        head = lambda h: self.model.apply(params_tree, h,
                                          method=self.model.compute_logits)
        return chunked_token_log_probs(head, hidden[:, :-1], labels[:, :-1])

    def _logp_fn(self, params, batch):
        # only `hidden` is consumed — XLA dead-code-eliminates the model's
        # own full-seq lm_head projection
        _, hidden = self.model.apply(params, batch["input_ids"],
                                     attention_mask=batch["attention_mask"],
                                     positions=batch["positions"],
                                     sp_mesh=self._sp_mesh,
                                     **self._vision_kwargs(batch))
        logp = self._token_logp(params, hidden, batch["input_ids"])
        logp = jnp.concatenate([logp, jnp.zeros_like(logp[:, :1])], axis=1)
        # logp[t] = log p(token at t+1 | ...); response_mask marks generated
        # tokens, so shift: contribution of token t is at position t-1
        shifted = jnp.roll(batch["response_mask"], -1, axis=1)
        return logp * shifted

    def _ppo_terms(self, logp, batch, total_tokens):
        """Shared PPO objective; masks in batch are already logp-aligned."""
        return ppo_loss(
            batch["old_log_probs"], logp, batch["advantages"],
            batch["response_mask"], batch["reward_masks"],
            ref_log_probs=batch.get("ref_log_probs"),
            kl_coef=self.cfg.actor.kl_coef, kl_type=self.cfg.actor.kl_type,
            clip_ratio_low=self.cfg.actor.clip_ratio_low,
            clip_ratio_high=self.cfg.actor.clip_ratio_high,
            clip_ratio_dual=self.cfg.actor.clip_ratio_dual,
            total_tokens=total_tokens)

    def _grad_fn(self, train, frozen, batch, total_tokens):
        def loss_fn(tp):
            ptree = {"params": {**tp, **frozen}}
            _, hidden = self.model.apply(
                ptree, batch["input_ids"],
                attention_mask=batch["attention_mask"],
                positions=batch["positions"],
                sp_mesh=self._sp_mesh,
                **self._vision_kwargs(batch))
            logp = self._token_logp(ptree, hidden, batch["input_ids"])
            logp = jnp.concatenate([logp, jnp.zeros_like(logp[:, :1])],
                                   axis=1)
            logp = logp * batch["response_mask"]   # already shifted
            return self._ppo_terms(logp, batch, total_tokens)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(train)
        return loss, metrics, grads

    def _grad_packed_fn(self, train, frozen, batch, total_tokens):
        """Padding-free micro step: rows pack several sequences; segment-id
        attention keeps them independent; masks (packed, logp-aligned) zero
        out cross-segment label positions."""
        def loss_fn(tp):
            ptree = {"params": {**tp, **frozen}}
            _, hidden = self.model.apply(
                ptree, batch["input_ids"],
                positions=batch["positions"],
                segment_ids=batch["segment_ids"],
                sp_mesh=self._sp_mesh,
                **{k: batch[k] for k in ("vision_embeds", "slot_map")
                   if k in batch})
            logp = self._token_logp(ptree, hidden, batch["input_ids"])
            logp = jnp.concatenate([logp, jnp.zeros_like(logp[:, :1])],
                                   axis=1)
            logp = logp * batch["response_mask"]
            return self._ppo_terms(logp, batch, total_tokens)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(train)
        return loss, metrics, grads

    @staticmethod
    def _acc(out, acc):
        loss, metrics, grads = out
        return loss, metrics, jax.tree_util.tree_map(jnp.add, acc, grads)

    def _apply_fn(self, params, opt_state, grads):
        gnorm = optax.global_norm(grads)
        # non-finite grad skip (reference dp_actor.py:163-169)
        ok = jnp.isfinite(gnorm)
        safe = jax.tree_util.tree_map(lambda g: jnp.where(ok, g, 0.0), grads)
        updates, new_opt = self.tx.update(safe, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params)
        # a skipped step must leave the optimizer state untouched too
        # (reference skips optimizer.step() entirely, dp_actor.py:163-166):
        # otherwise count/bias-correction advance, mu/nu decay, and the
        # Kahan compensation is consumed against an update never applied
        new_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt, opt_state)
        return new_params, new_opt, {
            "grad_norm": gnorm, "grad_skipped": 1.0 - ok.astype(jnp.float32)}

    # ---- rollout → batch ------------------------------------------------

    def rollout(self, prompts: List[dict], rng, *, n: Optional[int] = None,
                temperature: Optional[float] = None) -> RolloutBatch:
        """prompts: dicts with input_ids (+positions, vision_batch, slot_map,
        ground_truth). Each prompt sampled cfg.rollout.n times (n/temperature
        overridable — the validation loop's val_override_config role). The
        engine is built once and reused across steps (params swap, not
        re-init — obsoletes fsdp_vllm sleep/wake, :140-158)."""
        n = n if n is not None else self.cfg.rollout.n
        if self._offload:
            self._restore_frozen()   # engine prefill embeds need the tower
        if self._engine is None:
            kw = dict(self.engine_kwargs)
            if self.tp > 1:
                kw.setdefault("mesh", self.mesh)
            self._engine = Engine(self.rollout_model, self.params,
                                  eos_token_ids=self.eos, **kw)
        else:
            # resharding handoff, NOT a plain assignment: keeps the
            # engine's TP shardings across updates (see Engine.set_params)
            self._engine.set_params(self.params)
        sampling = SamplingParams(
            temperature=(temperature if temperature is not None
                         else self.cfg.rollout.temperature),
            top_p=self.cfg.rollout.top_p,
            max_tokens=self.cfg.rollout.max_response_length,
            logit_bias=self.logit_bias)
        # combine per-prompt vision tables into one batch table so the
        # update path runs the (frozen) vision tower once
        vision = None
        slot_offset = {}
        vis_tables = [p["vision_batch"] for p in prompts
                      if p.get("vision_batch") is not None]
        if vis_tables:
            from ..preprocess.qwen_vision import combine_vision_batches
            vision, offs = combine_vision_batches(vis_tables)
            it = iter(offs)
            for pi, p in enumerate(prompts):
                if p.get("vision_batch") is not None:
                    slot_offset[pi] = next(it)
        expanded = []
        uids = []
        gts = []
        prompt_idx = []
        for pi, p in enumerate(prompts):
            uid = self._uid_next
            self._uid_next += 1
            for _ in range(n):
                expanded.append({k: v for k, v in p.items()
                                 if k != "ground_truth"})
                uids.append(uid)
                gts.append(p.get("ground_truth", ""))
                prompt_idx.append(pi)
        # ONE prefill per prompt group; the n samples fork the prompt KV
        # blocks (the reference's vLLM SamplingParams(n) — the engine's
        # PromptGroup; outputs come back n-consecutive per prompt, matching
        # `expanded`'s layout)
        outs = self._engine.generate(
            [{k: v for k, v in p.items() if k != "ground_truth"}
             for p in prompts], sampling=sampling, rng=rng, n=n)
        # the vLLM sleep role (fsdp_vllm.py:140-158): the KV pools' HBM
        # belongs to the update step between rollouts; run() re-wakes
        self._engine.sleep()

        max_len = max(len(p["input_ids"]) + len(o)
                      for p, o in zip(expanded, outs))
        max_len = -(-max_len // 128) * 128
        bs = len(expanded)
        input_ids = np.zeros((bs, max_len), np.int32)
        mask = np.zeros((bs, max_len), np.int32)
        rmask = np.zeros((bs, max_len), np.int32)
        positions = np.zeros((3, bs, max_len), np.int32)
        slot_map = np.full((bs, max_len), -1, np.int32) if vision else None
        texts = self.batch_decode(outs)
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
            if vision is not None and p.get("slot_map") is not None:
                sl = np.asarray(p["slot_map"], np.int32)
                off = slot_offset[prompt_idx[i]]
                slot_map[i, :pl] = np.where(sl >= 0, sl + off, -1)
        return RolloutBatch(input_ids=input_ids, attention_mask=mask,
                            positions=positions, response_mask=rmask,
                            responses=outs, response_texts=texts,
                            uid=np.asarray(uids), ground_truths=gts,
                            vision=vision, slot_map=slot_map)

    def make_batch(self, prompt_iter: Iterator[List[dict]], rng,
                   timers=None) -> Optional[dict]:
        """Rollout + rewards + advantage with online filtering that pulls
        FRESH prompt groups per retry (ray_trainer._make_batch_data :467-558:
        each try draws a new dataloader batch; uids are unique across tries).
        prompt_iter yields lists of prompt dicts; exhausting it returns what
        was collected (None if nothing) — pass itertools.cycle(...) for the
        reference's restart-on-StopIteration behavior. timers: optional
        utils.tracker.Timers splitting gen / reward / host_assemble."""
        if timers is None:
            from ..utils.tracker import Timers
            timers = Timers()
        alg = self.cfg.algorithm
        n = self.cfg.rollout.n
        target_rows = self.cfg.trainer.rollout_batch_size * n
        collected: List[dict] = []
        tries = 0
        while True:
            tries += 1
            try:
                prompts = next(prompt_iter)
            except StopIteration:
                break
            rng, r1 = jax.random.split(rng)
            with timers("gen"):
                rb = self.rollout(prompts, r1)
            with timers("reward"):
                reward_tensor, _metrics = self.reward_manager.compute(
                    rb.response_texts, rb.ground_truths,
                    [len(r) for r in rb.responses])
            baselines = None
            if alg.adv_estimator == "remax":
                # ReMax greedy baseline (ray_trainer.py:497-509): one extra
                # temperature=0, n=1 rollout per prompt batch, scored with
                # the same reward fn; each prompt's n samples share its
                # greedy score as the advantage baseline
                rng, r2 = jax.random.split(rng)
                with timers("gen"):
                    grb = self.rollout(prompts, r2, n=1, temperature=0.0)
                with timers("reward"):
                    g_rewards, _ = self.reward_manager.compute(
                        grb.response_texts, grb.ground_truths,
                        [len(r) for r in grb.responses])
                baselines = np.repeat(g_rewards.sum(-1), n)
            keep_uids = set(rb.uid.tolist())
            if alg.online_filtering:
                if alg.filter_key not in self.channels:
                    raise ValueError(
                        f"algorithm.filter_key={alg.filter_key!r} is not a "
                        f"reward channel (have {list(self.channels)})")
                ch = self.channels.index(alg.filter_key)
                keep_uids = set()
                for uid in np.unique(rb.uid):
                    sel = rb.uid == uid
                    m = reward_tensor[sel, ch].mean()
                    if alg.filter_low < m < alg.filter_high:
                        keep_uids.add(int(uid))
            with timers("host_assemble"):
                part = self._finalize(rb, reward_tensor, keep_uids,
                                      baselines=baselines)
            if part is not None:
                collected.append(part)
            total = sum(c["input_ids"].shape[0] for c in collected)
            if total >= target_rows or not alg.online_filtering \
                    or tries >= alg.max_try_make_batch:
                break
        if not collected:
            return None
        # pad every part to the max sequence length before concatenating
        S = max(p["input_ids"].shape[1] for p in collected)

        def pad_part(p):
            out = {}
            for k, v in p.items():
                if k in ("input_ids", "attention_mask", "response_mask"):
                    out[k] = np.pad(v, ((0, 0), (0, S - v.shape[1])))
                elif k == "slot_map":
                    out[k] = np.pad(v, ((0, 0), (0, S - v.shape[1])),
                                    constant_values=-1)
                elif k in ("positions", "reward_masks"):
                    out[k] = np.pad(v, ((0, 0), (0, 0), (0, S - v.shape[-1])))
                else:
                    out[k] = v
            return out

        with timers("host_assemble"):
            parts = [pad_part(p) for p in collected]
            # merge per-try vision tables, re-offsetting each part's slot map
            tables = [p.pop("_vision", None) for p in parts]
            vision = None
            if any(t is not None for t in tables):
                from ..preprocess.qwen_vision import combine_vision_batches
                vis_list = [t for t in tables if t is not None]
                vision, offs = combine_vision_batches(vis_list)
                it = iter(offs)
                for p, t in zip(parts, tables):
                    if t is None:
                        p["slot_map"] = np.full_like(p["input_ids"], -1)
                    else:
                        off = next(it)
                        p["slot_map"] = np.where(p["slot_map"] >= 0,
                                                 p["slot_map"] + off, -1)
            batch = {k: np.concatenate([p[k] for p in parts],
                                       axis=1 if k == "positions" else 0)
                     for k in parts[0]}
            if vision is not None:
                batch["vision_batch"] = vision
        # keep whole uid groups: every part contributes multiples of n rows
        return _reindex(batch, slice(0, target_rows)) \
            if batch["input_ids"].shape[0] > target_rows else batch

    def _finalize(self, rb: RolloutBatch, reward_tensor, keep_uids,
                  baselines=None):
        keep = np.asarray([u in keep_uids for u in rb.uid])
        if not keep.any():
            return None
        sel = np.nonzero(keep)[0]
        max_resp = max(len(rb.responses[i]) for i in sel)
        resp_arr = np.zeros((len(sel), max_resp), np.int32)
        resp_m = np.zeros((len(sel), max_resp), np.int32)
        for j, i in enumerate(sel):
            r = rb.responses[i]
            resp_arr[j, :len(r)] = r
            resp_m[j, :len(r)] = 1
        reward_masks_resp = build_reward_masks(
            resp_arr, resp_m, self.tag_token_ids,
            channels=self.channels, spans=self.reward_manager.spans)
        # lift response-relative masks onto the full sequence layout
        bs, S = rb.input_ids[sel].shape
        reward_masks = np.zeros((bs, len(self.channels), S), np.int32)
        for j, i in enumerate(sel):
            pl = int(np.sum(rb.attention_mask[i]) -
                     np.sum(rb.response_mask[i]))
            nr = int(resp_m[j].sum())
            reward_masks[j, :, pl:pl + nr] = reward_masks_resp[j, :, :nr]

        if self.cfg.algorithm.adv_estimator == "router":
            adv, _ = compute_advantage(
                "router", reward_tensor=reward_tensor[sel],
                index=rb.uid[sel],
                norm_by_std=self.cfg.algorithm.norm_adv_by_std)
        else:
            # gae AND the token-level estimators (grpo/rloo/r++) compute
            # over the FULL assembled batch in fit() — critic values /
            # batch whitening / the reward-side KL penalty all need the
            # whole batch, not one filtering part
            adv = np.zeros((bs, len(self.channels)), np.float32)
        part = dict(input_ids=rb.input_ids[sel],
                    attention_mask=rb.attention_mask[sel],
                    positions=rb.positions[:, sel],
                    response_mask=rb.response_mask[sel],
                    reward_masks=reward_masks,
                    reward_tensor=reward_tensor[sel],
                    advantages=adv, uid=rb.uid[sel])
        if baselines is not None:
            part["reward_baselines"] = \
                np.asarray(baselines, np.float32)[sel]
        if rb.vision is not None:
            part["slot_map"] = rb.slot_map[sel]
            part["_vision"] = rb.vision
        return part

    # ---- log-prob inference (micro-batched) ------------------------------

    def compute_log_probs(self, params, batch: Dict[str, np.ndarray]
                          ) -> np.ndarray:
        """(bs, S) log-probs at shifted positions, micro-batched under the
        actor token budget (dp_actor.compute_log_probs role)."""
        bs, S = batch["input_ids"].shape
        if self._offload and "vision_batch" not in batch:
            # offloaded tower: pass the trainable subtree only, or the jit
            # would re-upload the host leaves on every micro-batch call
            # (the forward consumes vision_embeds, never the tower)
            params = {"params": self._split_params(params["params"])[0]}
        seqlens = batch["attention_mask"].sum(1)
        groups, _ = token_budget_micro_batches(
            seqlens, max(self.cfg.actor.micro_batch_tokens, int(S)))
        out = np.zeros((bs, S), np.float32)
        keys = [k for k in ("input_ids", "attention_mask", "positions",
                            "response_mask", "slot_map", "vision_embeds")
                if k in batch]
        for g in groups:
            rows = self._row_bucket(len(g))
            idx = list(g) + [g[0]] * (rows - len(g))
            micro = _reindex({k: batch[k] for k in keys}, idx)
            lp = self._logp_jit(params, self._put_batch(micro))
            out[list(g)] = np.asarray(lp)[:len(g)]
        return out

    # ---- policy update ---------------------------------------------------

    def _pack_micro(self, mini: Dict[str, np.ndarray], g: Sequence[int],
                    seqlens, width: int) -> Dict[str, jax.Array]:
        """Build the packed (padding-free) micro-batch: trim each sequence to
        its true length, pack with segment ids, pad rows to a dp-multiple."""
        nch = len(self.channels)
        seqs, extra = [], defaultdict(list)
        for i in g:
            L = int(seqlens[i])
            seqs.append(mini["input_ids"][i, :L])
            extra["response_mask"].append(mini["response_mask"][i, :L])
            extra["old_log_probs"].append(mini["old_log_probs"][i, :L])
            if "ref_log_probs" in mini:
                extra["ref_log_probs"].append(mini["ref_log_probs"][i, :L])
            if "slot_map" in mini:
                # +1 so the packer's zero-fill decodes as -1 (text position)
                extra["slot_map"].append(mini["slot_map"][i, :L] + 1)
            for a in range(3):
                extra[f"pos{a}"].append(mini["positions"][a, i, :L])
            for c in range(nch):
                rm = mini["reward_masks"][i, c, :L]
                extra[f"rm{c}"].append(rm)
                extra[f"adv{c}"].append(
                    (mini["advantages"][i, c] * rm).astype(np.float32))
        packed, ex = pack_sequences(seqs, width, extra=dict(extra))
        rows = self._row_bucket(packed.input_ids.shape[0])

        def padrows(x, r=rows):
            return np.pad(x, ((0, r - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))

        batch = {
            "input_ids": padrows(packed.input_ids),
            "segment_ids": padrows(packed.segment_ids),
            "positions": np.stack([padrows(ex[f"pos{a}"])
                                   for a in range(3)]),
            "response_mask": padrows(ex["response_mask"]),
            "old_log_probs": padrows(ex["old_log_probs"]),
            "reward_masks": np.stack([padrows(ex[f"rm{c}"])
                                      for c in range(nch)], axis=1),
            "advantages": np.stack([padrows(ex[f"adv{c}"])
                                    for c in range(nch)], axis=1),
        }
        if "ref_log_probs" in ex:
            batch["ref_log_probs"] = padrows(ex["ref_log_probs"])
        if "slot_map" in ex:
            batch["slot_map"] = padrows(ex["slot_map"]) - 1
            batch["vision_embeds"] = mini["vision_embeds"]
        return self._put_batch(batch)

    def update_policy(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        """Seqlen-balanced minibatch/micro-batch PPO update
        (dp_actor.update_policy :219-302 under GSPMD).

        Expects logp-space keys: old_log_probs (+ ref_log_probs) from
        compute_log_probs. Shifts response/reward masks into logp space here.
        """
        cfg = self.cfg
        if self._offload:
            self._offload_frozen()   # idempotent; fit() already did it
        batch = dict(batch)
        # shift masks into logp space: position t ↔ generated token t+1.
        # (np.roll wraparound is harmless: position 0 is always a prompt
        # token, so mask[..., 0] == 0.)
        batch["response_mask"] = np.roll(batch["response_mask"], -1, axis=1)
        batch["reward_masks"] = np.roll(batch["reward_masks"], -1, axis=2)
        if batch["advantages"].ndim == 3:   # per-token (GAE) → logp space too
            batch["advantages"] = np.roll(batch["advantages"], -1, axis=2)

        bs, S = batch["input_ids"].shape
        seqlens = batch["attention_mask"].sum(1)
        if self.dp > 1 and bs % self.dp == 0:
            perm = reorder_for_dp(seqlens, self.dp)
            batch = _reindex(batch, perm)
            seqlens = seqlens[perm]

        # packed path supports precomputed vision embeds (slot maps pack like
        # any per-token channel); raw vision_batch must go padded
        packed_ok = (cfg.actor.padding_free and "vision_batch" not in batch
                     and batch["advantages"].ndim == 2)
        mini_size = min(cfg.trainer.global_batch_size, bs)
        agg = defaultdict(list)
        for _ in range(cfg.actor.ppo_epochs):
            for lo in range(0, bs, mini_size):
                idx = np.arange(lo, min(lo + mini_size, bs))
                mini = _reindex(batch, idx)
                mlens = seqlens[idx]
                # global per-channel token totals (the reference's
                # all-reduced total_response_tokens, dp_actor.py:237-238 —
                # a plain sum here because the minibatch is logically global)
                total = self._put(mini["reward_masks"]
                                  .sum((0, 2)).astype(np.float32), None)
                groups, _ = token_budget_micro_batches(
                    mlens, max(cfg.actor.micro_batch_tokens, int(S)))
                train, frozen = self._split_params(self.params["params"])
                # offloaded tower: the grad jits get an EMPTY frozen arg —
                # host leaves as jit inputs would re-upload 1.34 GB per
                # micro-batch; the forward never touches the tower (the
                # model consumes vision_embeds; flax resolves submodule
                # params lazily, so the missing subtree never errors)
                frozen_arg = {} if self._offload else frozen
                grads = None
                for g in groups:
                    if packed_ok:
                        micro = self._pack_micro(mini, g, mlens, S)
                        if grads is None:
                            loss, m, grads = self._grad_packed_jit(
                                train, frozen_arg, micro, total)
                        else:
                            loss, m, grads = self._grad_packed_acc_jit(
                                train, frozen_arg, micro, total, grads)
                    else:
                        rows = self._row_bucket(len(g))
                        # pad with duplicates of a real row (an all-zero
                        # attention row would NaN the softmax) and zero
                        # their response/reward masks → zero contribution
                        gi = list(g) + [g[0]] * (rows - len(g))
                        micro = _reindex(mini, gi)
                        for k in ("response_mask", "reward_masks"):
                            micro[k][len(g):] = 0
                        micro = self._put_batch(micro)
                        if grads is None:
                            loss, m, grads = self._grad_jit(
                                train, frozen_arg, micro, total)
                        else:
                            loss, m, grads = self._grad_acc_jit(
                                train, frozen_arg, micro, total, grads)
                    agg["loss"].append(loss)
                    for k, v in m.items():
                        agg[k].append(v)
                train, self.opt_state, am = self._apply_jit(
                    train, self.opt_state, grads)
                self.params = {"params": {**train, **frozen}}
                for k, v in am.items():
                    agg[k].append(v)
        if self._engine is not None and self._engine.tp == 1:
            # at tp==1 set_params keeps a zero-copy ALIAS of the trainer's
            # arrays, which _apply_jit just donated — invalidate so any
            # engine use before the next rollout() (which re-set_params)
            # fails loudly instead of dereferencing deleted buffers
            self._engine.params = None
        return {k: float(np.mean([np.asarray(x) for x in v]))
                for k, v in agg.items()}

    def _prepare_gae(self, batch: Dict[str, np.ndarray],
                     timers=None) -> Dict[str, float]:
        """GAE advantages/returns from critic values, with the optional
        reward-side KL penalty (ray_trainer.py:110-127, :622-649).

        Space bookkeeping: critic values and log-probs live at position t
        for token t+1 (logp space); GAE runs at token positions, so values
        and KL roll +1 into token space and advantages/returns roll -1 back.
        """
        assert self.critic is not None, "adv_estimator 'gae' needs a critic"
        alg = self.cfg.algorithm
        if timers is None:
            from ..utils.tracker import Timers
            timers = Timers()
        with timers("values"):
            values = self.critic.compute_values(batch)  # (bs, S), logp space
        batch["values"] = values
        tok_scores, metrics = self._scored_tokens(batch)
        values_tok = np.roll(values, 1, axis=1) * batch["response_mask"]
        adv_tok, ret_tok = compute_advantage(
            "gae", token_rewards=tok_scores, values=values_tok,
            response_mask=batch["response_mask"], gamma=alg.gamma,
            lam=alg.lam)
        batch["advantages"] = adv_tok[:, None, :]
        batch["reward_masks"] = \
            batch["response_mask"][:, None, :].astype(np.int32)
        batch["returns"] = np.roll(ret_tok, -1, axis=1)   # logp space
        return metrics

    def _scored_tokens(self, batch) -> Tuple[np.ndarray, Dict[str, float]]:
        """(bs, S) token-space scores: the scalar reward at the last
        response token (sequential reward manager role, reward/function.py:
        80-105), plus the optional reward-side KL penalty
        (ray_trainer.py:110-127 — applied for ALL estimators that consume
        token rewards, not just GAE)."""
        bs, S = batch["input_ids"].shape
        tok_scores = np.zeros((bs, S), np.float32)
        last = batch["attention_mask"].sum(1) - 1
        tok_scores[np.arange(bs), last] = batch["reward_tensor"].sum(-1)
        metrics = {}
        if self.kl_ctrl is not None and "ref_log_probs" in batch:
            from .ppo import apply_kl_penalty
            old_tok = np.roll(batch["old_log_probs"], 1, axis=1)
            ref_tok = np.roll(batch["ref_log_probs"], 1, axis=1)
            tok_scores, metrics = apply_kl_penalty(
                tok_scores, old_tok, ref_tok, batch["response_mask"],
                self.kl_ctrl, self.cfg.algorithm.kl_penalty)
        # post-KL token rewards feed the critic/rewards metric family
        # (the reference's token_level_rewards, metrics.py:50)
        self._last_token_scores = tok_scores
        return tok_scores, metrics

    def _prepare_token_adv(self, batch: Dict[str, np.ndarray]
                           ) -> Dict[str, float]:
        """Per-token advantages for grpo/rloo/reinforce_plus_plus/remax over
        the FULL assembled batch (group stats / batch whitening need every
        row; ray_trainer.compute_advantage :130-159). Stored (bs, 1, S) —
        the same already-per-token layout the GAE path and
        compute_policy_loss use; reward_masks collapse to the response
        mask. remax consumes the greedy-rollout baselines make_batch
        collected (reference reward_baselines, ray_trainer.py:497-509)."""
        alg = self.cfg.algorithm
        tok_scores, metrics = self._scored_tokens(batch)
        adv_tok, _ = compute_advantage(
            alg.adv_estimator, token_rewards=tok_scores,
            response_mask=batch["response_mask"], index=batch["uid"],
            greedy_scores=batch.get("reward_baselines"),
            gamma=alg.gamma, norm_by_std=alg.norm_adv_by_std)
        batch["advantages"] = adv_tok[:, None, :]
        batch["reward_masks"] = \
            batch["response_mask"][:, None, :].astype(np.int32)
        return metrics

    # ---- validation / checkpointing ---------------------------------------

    def validate(self, prompts: List[dict], rng=None, tracker=None
                 ) -> Dict[str, float]:
        """Validation rollout + reward scoring + deterministic gen-sample
        table (ray_trainer._validate :375-448 and
        _maybe_log_val_generations :375-391)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        t = self.cfg.trainer
        rb = self.rollout(prompts, rng, n=t.val_n,
                          temperature=t.val_temperature)
        reward_tensor, reward_metrics = self.reward_manager.compute(
            rb.response_texts, rb.ground_truths,
            [len(r) for r in rb.responses])
        scores = reward_tensor.sum(-1)
        if tracker is not None and t.val_generations_to_log > 0:
            inputs = [self.decode(list(p["input_ids"])) for p in prompts
                      for _ in range(t.val_n)]
            samples = sorted(zip(inputs, rb.response_texts,
                                 rb.ground_truths, scores.tolist()),
                             key=lambda x: x[0])
            np.random.RandomState(42).shuffle(samples)
            tracker.log_generations(self.step, [
                dict(input=i, output=o, label=l, score=s)
                for i, o, l, s in samples[:t.val_generations_to_log]])
        out = {"val/reward_score": float(scores.mean()),
               "val/response_length": float(np.mean(
                   [len(r) for r in rb.responses]))}
        out.update({f"val/{k}_reward": float(np.mean(v))
                    for k, v in reward_metrics.items()})
        return out

    def save(self, best_metric: Optional[float] = None) -> str:
        """Checkpoint actor (+critic) params/opt state + host counters with
        tracker manifest and keep-best GC (ray_trainer._save_checkpoint
        :312-344)."""
        from ..training.checkpoint import save_checkpoint
        tree = {"params": self.params["params"], "opt_state": self.opt_state}
        if self.critic is not None:
            tree["critic_params"] = self.critic.params["params"]
            tree["critic_opt_state"] = self.critic.opt_state
        extra = {"step": self.step, "uid_next": self._uid_next,
                 "kl_coef": (self.kl_ctrl.kl_coef if self.kl_ctrl else None)}
        if self.data_iter is not None:
            extra["data"] = self.data_iter.state()
        if self._rng is not None:
            extra["rng"] = np.asarray(
                jax.random.key_data(self._rng)).tolist()
        return save_checkpoint(self.cfg.trainer.output_dir, self.step, tree,
                               extra=extra, best_metric=best_metric,
                               save_limit=self.cfg.trainer.save_limit)

    def maybe_resume(self) -> bool:
        """Auto-resume from the newest checkpoint under output_dir
        (ray_trainer._load_checkpoint :346-373 with find_last_checkpoint)."""
        from ..training.checkpoint import find_latest_ckpt, load_checkpoint
        path = find_latest_ckpt(self.cfg.trainer.output_dir)
        if path is None:
            return False
        target = {"params": self.params["params"],
                  "opt_state": self.opt_state}
        if self.critic is not None:
            target["critic_params"] = self.critic.params["params"]
            target["critic_opt_state"] = self.critic.opt_state
        try:
            tree, extra = load_checkpoint(path, target=target)
        except Exception as e:
            raise RuntimeError(
                f"failed to restore RL checkpoint {path}: {e}\n"
                "Note: round-4 changed the opt_state structure under "
                "freeze_vision_tower (frozen keys are excluded from the "
                "optimizer entirely) — RL checkpoints saved before that "
                "change cannot be restored with freeze_vision_tower set."
            ) from e
        self.params = {"params": tree["params"]}
        self.opt_state = tree["opt_state"]
        if self.critic is not None:
            self.critic.params = {"params": tree["critic_params"]}
            self.critic.opt_state = tree["critic_opt_state"]
        self.step = int(extra["step"])
        self._uid_next = int(extra["uid_next"])
        if self.kl_ctrl is not None and extra.get("kl_coef") is not None:
            self.kl_ctrl.kl_coef = extra["kl_coef"]
        if self.data_iter is not None and extra.get("data") is not None:
            self.data_iter.set_state(extra["data"])
        if extra.get("rng") is not None:
            self._rng = jax.random.wrap_key_data(
                jnp.asarray(extra["rng"], jnp.uint32))
        return True

    # ---- outer loop ------------------------------------------------------

    def fit(self, prompt_iter: Iterable[List[dict]], rng=None,
            logger: Optional[Callable[[int, dict], None]] = None,
            val_prompts: Optional[List[dict]] = None, tracker=None):
        """prompt_iter yields lists of prompt dicts (one rollout batch per
        step; with online filtering each step may consume several). A
        checkpoint-resumed run continues with the saved rng (and, when
        self.data_iter is the prompt iterator, the saved data cursor)."""
        if rng is None:
            rng = self._rng if self._rng is not None else jax.random.PRNGKey(0)
        it = iter(prompt_iter)
        history = []
        self._val_score: Optional[float] = None
        from ..utils.tracker import Timers
        from .metrics import (compute_data_metrics, compute_timing_metrics,
                              compute_throughput_metrics)
        num_chips = (len(self.mesh.devices.flat)
                     if self.mesh is not None else 1)
        while True:
            t0 = time.time()
            timers = Timers()
            self._last_token_scores = None
            rng, r1 = jax.random.split(rng)
            batch = self.make_batch(it, r1, timers=timers)
            if batch is None:
                break
            if "vision_batch" in batch:
                # frozen tower ⇒ encode all images ONCE per step into a flat
                # embedding table consumed by logp/update via slot maps
                # (replaces the reference's per-micro multi_modal_inputs +
                # uid cache, fsdp_workers.py:444-486)
                assert self.cfg.actor.freeze_vision_tower, (
                    "vision RL update requires freeze_vision_tower=True "
                    "(precomputed embeds are stop-grad)")
                from ..preprocess.qwen_vision import pad_vision_table
                vb = pad_vision_table(batch.pop("vision_batch"), 4096)
                if self._vision_jit is None:
                    self._vision_jit = jax.jit(
                        lambda p, v: self.model.apply(
                            p, v, method=self.model.encode_images))
                with timers("vision_embed"):
                    batch["vision_embeds"] = self._vision_jit(
                        self.params,
                        {k: jnp.asarray(v) for k, v in vb.items()})
            if self._offload:
                # tower's last use this step was vision_embed — free its
                # HBM for the logp/update passes (rollout() restores)
                self._offload_frozen()
            # old log probs under the current (pre-update) policy
            with timers("old"):
                batch["old_log_probs"] = self.compute_log_probs(self.params,
                                                                batch)
            if self.ref_params is not None and \
                    (self.cfg.actor.kl_coef > 0 or self.kl_ctrl is not None):
                with timers("ref"):
                    # offloaded ref: upload for this phase only; `rp` going
                    # out of scope drops the device copy before the update
                    rp = (jax.device_put(self.ref_params)
                          if self._offload_ref else self.ref_params)
                    batch["ref_log_probs"] = self.compute_log_probs(
                        rp, batch)
                    del rp
            extra_metrics = {}
            with timers("adv"):
                if self.cfg.algorithm.adv_estimator == "gae":
                    extra_metrics = self._prepare_gae(batch, timers=timers)
                elif self.cfg.algorithm.adv_estimator != "router":
                    extra_metrics = self._prepare_token_adv(batch)
            if self.step >= self.cfg.trainer.critic_warmup:
                with timers("update_actor"):
                    m = self.update_policy(batch)
            else:
                m = {}
            if self.critic is not None and "returns" in batch:
                with timers("update_critic"):
                    m.update(self.critic.update(batch))
            m.update(extra_metrics)
            self.step += 1
            m["reward_mean"] = float(batch["reward_tensor"].sum(-1).mean())
            m["step_time_s"] = time.time() - t0
            # the reference's per-step metric families (trainer/metrics.py:
            # 27-123): critic/* stats, length stats + clip ratios,
            # timing_s/* + timing_per_token_ms/*, perf/throughput
            timing_raw = dict(timers.times)
            timing_raw["step"] = m["step_time_s"]
            num_resp = int(batch["response_mask"].sum())
            num_all = int(batch["attention_mask"].sum())
            m.update(compute_data_metrics(
                batch, self.cfg.rollout.max_prompt_length,
                self.cfg.rollout.max_response_length,
                token_rewards=self._last_token_scores))
            m.update(compute_timing_metrics(timing_raw, num_resp, num_all))
            m.update(compute_throughput_metrics(num_all, timing_raw["step"],
                                                num_chips))
            t = self.cfg.trainer
            if val_prompts is not None and t.val_freq > 0 and \
                    self.step % t.val_freq == 0:
                rng, rv = jax.random.split(rng)
                vm = self.validate(val_prompts, rv, tracker=tracker)
                self._val_score = vm["val/reward_score"]
                m.update(vm)
            if t.save_freq > 0 and self.step % t.save_freq == 0:
                # stash the NEXT iteration's rng: a resumed run then draws
                # the same randomness an uninterrupted run would
                self._rng = rng
                self.save(best_metric=self._val_score)
            history.append((self.step, m))
            if logger:
                logger(self.step, m)
            if 0 < self.cfg.trainer.total_steps <= self.step:
                break
        return history
