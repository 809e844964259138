"""Critic (value-head) trainer for the GAE path.

Parity with /root/reference/src/rsgrpo/verl/workers/critic/dp_critic.py:
compute_values (:142-170) and update_critic (:172-230) — minibatch loop with
globally-normalized token counts and the clipped value loss
(core_algos.compute_value_loss :475-521). Distribution follows rl/trainer.py:
FSDP-sharded params over the mesh `data` axis, batches sharded on dim 0, the
all-reduced total_response_tokens is a plain sum under GSPMD.

Alignment: values live in logp space — the value at position t scores the
token generated at t+1 (the reference's values[:, -resp-1:-1] slice) — so
the update consumes the same shifted response masks as the actor.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import CriticConfig
from ..mesh import DATA, REPLICA, shard_params_fsdp
from .ppo import compute_value_loss
from .seqlen import token_budget_micro_batches
from .trainer import _reindex


class CriticTrainer:
    def __init__(self, model, params, cfg: CriticConfig, *, mesh=None,
                 global_batch_size: int = 32, ppo_epochs: Optional[int] = None,
                 total_steps: int = 0):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.dp = 1 if mesh is None else (mesh.shape[REPLICA] *
                                          mesh.shape[DATA])
        if mesh is not None:
            params = {"params": shard_params_fsdp(params["params"], mesh)}
        self.params = params
        self.global_batch_size = global_batch_size
        self.ppo_epochs = ppo_epochs or cfg.ppo_epochs
        from ..training.optim import (adamw_from_config,
                                      constant_schedule_with_warmup,
                                      resolve_warmup_steps)
        # total_steps: the schedule horizon for lr_warmup_ratio (the
        # reference's optim_config.training_steps, fsdp_workers.py:309-313)
        lr = constant_schedule_with_warmup(
            cfg.lr, resolve_warmup_steps(cfg.lr_warmup_steps,
                                         cfg.lr_warmup_ratio, total_steps))
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            adamw_from_config(lr, weight_decay=cfg.weight_decay,
                              b1=cfg.betas[0], b2=cfg.betas[1],
                              state_dtype=cfg.optimizer_state_dtype))
        self.opt_state = self.tx.init(params["params"])
        self._value_jit = jax.jit(self._value_fn)
        self._grad_jit = jax.jit(self._grad_fn)
        self._apply_jit = jax.jit(self._apply_fn, donate_argnums=(0, 1, 2))
        # accumulation FUSED into the grad program with a donated
        # accumulator (same OOM fix as the actor's _grad_acc_jit: a
        # separate add keeps two full param-sized grad trees live)
        self._grad_acc_jit = jax.jit(
            lambda p, b, t, acc: self._fold(self._grad_fn(p, b, t), acc),
            donate_argnums=(3,))

    @staticmethod
    def _fold(out, acc):
        loss, metrics, grads = out
        return loss, metrics, jax.tree_util.tree_map(jnp.add, acc, grads)

    def _put(self, x, batch_dim: Optional[int] = 0):
        x = jnp.asarray(x)
        if self.mesh is None:
            return x
        spec = [None] * x.ndim
        if batch_dim is not None and x.shape[batch_dim] % self.dp == 0:
            spec[batch_dim] = (REPLICA, DATA)
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    def _row_bucket(self, n: int) -> int:
        b = max(self.dp, 1)
        while b < n:
            b *= 2
        return b

    @staticmethod
    def _vision_kwargs(batch):
        # multimodal prompts: frozen-tower embeds table + per-row slot maps
        # (the reference critic forwards multi_modal_inputs through the
        # value model, dp_critic.py:64-68,99,117)
        return {k: batch[k] for k in ("slot_map", "vision_embeds")
                if k in batch}

    def _value_fn(self, params, batch):
        return self.model.apply(params, batch["input_ids"],
                                attention_mask=batch["attention_mask"],
                                positions=batch["positions"],
                                **self._vision_kwargs(batch))

    def _grad_fn(self, params, batch, total_tokens):
        def loss_fn(p):
            vpreds = self.model.apply({"params": p}, batch["input_ids"],
                                      attention_mask=batch["attention_mask"],
                                      positions=batch["positions"],
                                      **self._vision_kwargs(batch))
            vf_loss, metrics = compute_value_loss(
                vpreds, batch["returns"], batch["values"],
                batch["response_mask"],
                cliprange_value=self.cfg.cliprange_value)
            # loss · Σmask / global-total (dp_actor-style normalization;
            # the ×world_size cancels under GSPMD's global sums)
            local = jnp.sum(batch["response_mask"]).astype(jnp.float32)
            return vf_loss * local / jnp.maximum(total_tokens, 1.0), metrics
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, metrics, grads

    def _apply_fn(self, params, opt_state, grads):
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm)
        safe = jax.tree_util.tree_map(lambda g: jnp.where(ok, g, 0.0), grads)
        updates, new_opt = self.tx.update(safe, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params)
        # skipped step: optimizer state stays untouched too (see RLTrainer)
        new_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt, opt_state)
        return new_params, new_opt, {"grad_norm": gnorm}

    def _put_micro(self, micro):
        return {k: self._put(v, 1 if k == "positions"
                             else None if k == "vision_embeds" else 0)
                for k, v in micro.items()}

    def compute_values(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """(bs, S) fp32 values (logp space), micro-batched. Vision prompts
        pass slot_map + the precomputed vision_embeds table through the
        value model (reference dp_critic.compute_values with
        multi_modal_inputs)."""
        bs, S = batch["input_ids"].shape
        seqlens = batch["attention_mask"].sum(1)
        groups, _ = token_budget_micro_batches(
            seqlens, max(self.cfg.micro_batch_tokens, int(S)))
        out = np.zeros((bs, S), np.float32)
        keys = [k for k in ("input_ids", "attention_mask", "positions",
                            "slot_map", "vision_embeds") if k in batch]
        for g in groups:
            rows = self._row_bucket(len(g))
            idx = list(g) + [g[0]] * (rows - len(g))
            micro = _reindex({k: batch[k] for k in keys}, idx)
            v = self._value_jit(self.params, self._put_micro(micro))
            out[list(g)] = np.asarray(v)[:len(g)]
        return out

    def update(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        """Clipped value update. Expects logp-space keys: values, returns;
        shifts the response mask into logp space itself."""
        batch = dict(batch)
        batch["response_mask"] = np.roll(batch["response_mask"], -1, axis=1)
        bs, S = batch["input_ids"].shape
        seqlens = batch["attention_mask"].sum(1)
        mini_size = min(self.global_batch_size, bs)
        keys = tuple(k for k in
                     ("input_ids", "attention_mask", "positions",
                      "response_mask", "values", "returns", "slot_map",
                      "vision_embeds") if k in batch)
        agg = defaultdict(list)
        for _ in range(self.ppo_epochs):
            for lo in range(0, bs, mini_size):
                idx = np.arange(lo, min(lo + mini_size, bs))
                mini = _reindex({k: batch[k] for k in keys}, idx)
                total = self._put(
                    np.float32(mini["response_mask"].sum()), None)
                groups, _ = token_budget_micro_batches(
                    seqlens[idx], max(self.cfg.micro_batch_tokens, int(S)))
                grads = None
                for g in groups:
                    rows = self._row_bucket(len(g))
                    gi = list(g) + [g[0]] * (rows - len(g))
                    micro = _reindex(mini, gi)
                    micro["response_mask"] = micro["response_mask"].copy()
                    micro["response_mask"][len(g):] = 0
                    dev = self._put_micro(micro)
                    if grads is None:
                        loss, m, grads = self._grad_jit(
                            self.params["params"], dev, total)
                    else:
                        loss, m, grads = self._grad_acc_jit(
                            self.params["params"], dev, total, grads)
                    agg["vf_loss"].append(loss)
                    for k, v in m.items():
                        agg[k].append(v)
                self.params["params"], self.opt_state, am = self._apply_jit(
                    self.params["params"], self.opt_state, grads)
                self.params = {"params": self.params["params"]}
                for k, v in am.items():
                    agg[k].append(v)
        return {f"critic/{k}": float(np.mean([np.asarray(x) for x in v]))
                for k, v in agg.items()}
