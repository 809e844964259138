"""Supervised fine-tuning (the EVisRAG stage-1 role).

Parity with /root/reference/evisrag_scripts/full_sft.sh (LLaMA-Factory full
finetune of Qwen2.5-VL: freeze_vision_tower, cutoff 32000, DeepSpeed ZeRO-3):
cross-entropy on response tokens only, optional vision-tower freeze via a
gradient mask, FSDP-style sharding from mesh.py — one jitted step instead of
an external trainer framework.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..rl.ppo import log_probs_from_logits


@dataclasses.dataclass
class SFTConfig:
    lr: float = 5e-7
    weight_decay: float = 0.0
    warmup_steps: int = 10
    total_steps: int = 1000
    grad_clip: float = 1.0
    freeze_vision_tower: bool = True
    vision_key: str = "visual"
    # Ulysses SP degree for the forward (reference full_sft.sh runs under
    # DeepSpeed; long-context SFT here shards the sequence axis instead) —
    # requires a mesh with seq=ulysses_size and a model accepting sp_mesh
    ulysses_size: int = 1
    # "bfloat16" = AnyPrecisionAdamW role (torch_functional.py:204-339)
    optimizer_state_dtype: str = "float32"


def sft_loss(model_apply: Callable, params, batch, sp_mesh=None) -> tuple:
    """batch: input_ids (B,S), attention_mask, response_mask (1 on tokens the
    model must predict), + optional positions/vision_batch/slot_map."""
    kw = {"sp_mesh": sp_mesh} if sp_mesh is not None else {}
    logits, _ = model_apply(
        params, batch["input_ids"],
        attention_mask=batch.get("attention_mask"),
        positions=batch.get("positions"),
        vision_batch=batch.get("vision_batch"),
        slot_map=batch.get("slot_map"), **kw)
    labels = jnp.roll(batch["input_ids"], -1, axis=1)
    logp = log_probs_from_logits(logits[:, :-1], labels[:, :-1])
    # token t predicts t+1 → shift response mask left
    mask = jnp.roll(batch["response_mask"], -1, axis=1)[:, :-1].astype(jnp.float32)
    loss = -jnp.sum(logp * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    acc = jnp.sum((jnp.argmax(logits[:, :-1], -1) == labels[:, :-1]) * mask) \
        / jnp.maximum(jnp.sum(mask), 1.0)
    return loss, {"loss": loss, "token_accuracy": acc}


def make_sft_step(model_apply: Callable, cfg: SFTConfig, mesh=None):
    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.lr, max(cfg.warmup_steps, 1)),
         optax.constant_schedule(cfg.lr)], [max(cfg.warmup_steps, 1)])
    from .optim import adamw_from_config
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        adamw_from_config(schedule, weight_decay=cfg.weight_decay,
                          state_dtype=cfg.optimizer_state_dtype))
    if cfg.freeze_vision_tower:
        # grad zeroing alone is NOT a freeze under decoupled weight decay:
        # adamw's add_decayed_weights still shrinks zero-grad params toward
        # zero. Mask the optimizer like rl/trainer.py (mask as a callable —
        # params aren't available at build time), and zero the masked-out
        # leaves' pass-through updates explicitly.
        def _trainable(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, x: cfg.vision_key not in
                [getattr(p, "key", getattr(p, "name", "")) for p in path],
                params)
        tx = optax.chain(
            optax.masked(tx, _trainable),
            optax.masked(optax.set_to_zero(),
                         lambda params: jax.tree_util.tree_map(
                             lambda m: not m, _trainable(params))))
    sp_mesh = mesh if (cfg.ulysses_size > 1 and mesh is not None) else None
    if sp_mesh is not None and dict(mesh.shape).get("seq", 1) != cfg.ulysses_size:
        raise ValueError(f"ulysses_size={cfg.ulysses_size} needs a mesh with "
                         f"seq={cfg.ulysses_size}")

    def freeze_mask(grads):
        if not cfg.freeze_vision_tower:
            return grads
        def zero_vision(path, g):
            names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            return jnp.zeros_like(g) if cfg.vision_key in names else g
        return jax.tree_util.tree_map_with_path(zero_vision, grads)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: sft_loss(model_apply, p, batch, sp_mesh=sp_mesh),
            has_aux=True)(params)
        grads = freeze_mask(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dict(metrics,
                                       grad_norm=optax.global_norm(grads))

    return tx, step
