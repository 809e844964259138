"""Retriever training loop: optax AdamW + warmup, pjit train step with FSDP
param sharding, GradCache option, metrics, checkpointing.

Replaces the reference's HF-Trainer subclass + DeepSpeed/accelerate stack
(/root/reference/src/openmatch/trainer/dense_trainer.py, driver/train.py):
single-controller JAX — one jitted train_step over the mesh does DP batch
sharding, FSDP weight sharding, and cross-device negatives in one program.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainConfig
from ..mesh import DATA, REPLICA, shard_params_fsdp
from .contrastive import (ContrastiveConfig, direct_loss_fn,
                          gradcache_grad_fn, stack_micro_batches)


def make_optimizer(cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    warmup = max(1, int(cfg.warmup_ratio * total_steps))
    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.lr, warmup),
         optax.linear_schedule(cfg.lr, 0.0, max(1, total_steps - warmup))],
        [warmup])
    from .optim import adamw_from_config
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        adamw_from_config(schedule, weight_decay=cfg.weight_decay,
                          state_dtype=cfg.optimizer_state_dtype),
    )
    return tx


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_train_step(encode: Callable, cfg: TrainConfig,
                    tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    num_micro: Optional[int] = None):
    """Build the jitted train step.

    encode(params, batch, rng) → (B, D) reps. Batches arrive as pytrees; with
    grad_cache they must be pre-stacked (num_micro, micro, ...) pytrees.
    Returns step_fn(params, opt_state, q_batch, p_batch, rng) →
    (params, opt_state, metrics).
    """
    # reference parity: biaxial_loss raises (dense_trainer.py:437-438);
    # inbatch_loss=False is undefined there (the flag is never read,
    # arguments.py:179) and the contrastive loss here IS in-batch CE —
    # reject instead of silently no-op'ing
    if cfg.biaxial_loss:
        raise NotImplementedError("biaxial_loss is not implemented "
                                  "(the reference forbids it too)")
    if not cfg.inbatch_loss:
        raise NotImplementedError(
            "inbatch_loss=False has no defined semantics: the contrastive "
            "objective is in-batch CE (reference never consumes the flag)")
    if not cfg.negatives_x_device:
        raise NotImplementedError(
            "negatives_x_device=False (per-device negatives) is not "
            "supported: the GSPMD trainer computes the loss over the "
            "logically-global batch, so negatives are always shared — "
            "shrink data.batch_size to reduce the negative pool instead")
    ccfg = ContrastiveConfig(temperature=cfg.softmax_temperature,
                             n_passages=cfg.n_passages,
                             passage_stop_grad=cfg.passage_stop_grad)

    if cfg.grad_cache:
        grad_fn = gradcache_grad_fn(encode, ccfg,
                                    num_micro or cfg.grad_cache_micro_batch_size)
    else:
        loss_fn = direct_loss_fn(encode, ccfg)

        def grad_fn(params, q_batch, p_batch, rng):
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, q_batch, p_batch, rng)

    def step_fn(params, opt_state, q_batch, p_batch, rng):
        (loss, metrics), grads = grad_fn(params, q_batch, p_batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, grad_norm=gnorm)
        return params, opt_state, metrics

    donate = (0, 1)
    if mesh is not None:
        return jax.jit(step_fn, donate_argnums=donate)
    return jax.jit(step_fn, donate_argnums=donate)


class RetrieverTrainer:
    """Host-side loop: iterate batches, run the pjit step, log, checkpoint."""

    def __init__(self, encode: Callable, params, cfg: TrainConfig,
                 mesh: Optional[Mesh] = None, total_steps: int = 1000,
                 logger: Optional[Callable[[int, dict], None]] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.tx = make_optimizer(cfg, total_steps)
        if mesh is not None:
            params = shard_params_fsdp(params, mesh)
        self.params = params
        self.opt_state = self.tx.init(params)
        self.step_fn = make_train_step(encode, cfg, self.tx, mesh)
        self.logger = logger or (lambda step, m: None)
        self.step = 0
        # optional data.StatefulIterator: its cursor rides in every
        # checkpoint so resume continues at the exact row (the reference's
        # StatefulDataLoader state, ray_trainer.py:332-334)
        self.data_iter = None

    def place_batch(self, batch):
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, batch)

        def put(x):
            spec = P((REPLICA, DATA), *([None] * (np.ndim(x) - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))
        return jax.tree_util.tree_map(put, batch)

    def train(self, batches: Iterable, rng: Optional[jax.Array] = None,
              checkpoint_dir: Optional[str] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        metrics_hist = []
        t0 = time.time()
        for q_batch, p_batch in batches:
            rng, step_rng = jax.random.split(rng)
            q_batch = self.place_batch(q_batch)
            p_batch = self.place_batch(p_batch)
            self.params, self.opt_state, metrics = self.step_fn(
                self.params, self.opt_state, q_batch, p_batch, step_rng)
            self.step += 1
            if self.step % self.cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["steps_per_s"] = self.cfg.log_every / (time.time() - t0)
                t0 = time.time()
                metrics_hist.append((self.step, m))
                self.logger(self.step, m)
            if checkpoint_dir and self.step % self.cfg.save_every == 0:
                self.save(checkpoint_dir)
            if 0 < self.cfg.max_steps <= self.step:
                break
        return metrics_hist

    def save(self, checkpoint_dir: str) -> str:
        from .checkpoint import save_checkpoint
        extra = {"step": self.step}
        if self.data_iter is not None:
            extra["data"] = self.data_iter.state()
        return save_checkpoint(
            checkpoint_dir, self.step,
            {"params": self.params, "opt_state": self.opt_state},
            extra=extra,
            save_limit=getattr(self.cfg, "save_limit", None))

    def maybe_resume(self, checkpoint_dir: str) -> int:
        """Auto-resume params/optimizer/step from the newest checkpoint
        (the reference resumes via HF Trainer checkpoints; weak spot:
        find_latest_ckpt existed but nothing called it on start). When
        self.data_iter is set and the checkpoint carries a data cursor, the
        iterator is fast-forwarded to the exact row and the caller must NOT
        skip batches; otherwise returns the consumed step count so legacy
        drivers can skip that many batches."""
        from .checkpoint import find_latest_ckpt, load_checkpoint
        path = find_latest_ckpt(checkpoint_dir)
        if path is None:
            return 0
        tree, extra = load_checkpoint(
            path, target={"params": self.params, "opt_state": self.opt_state})
        self.params = tree["params"]
        self.opt_state = tree["opt_state"]
        self.step = int(extra["step"]) if extra else 0
        if self.data_iter is not None and extra and "data" in extra:
            self.data_iter.set_state(extra["data"])
        return self.step
