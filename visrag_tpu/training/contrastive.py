"""Contrastive loss + train step for the retriever (in-batch negatives,
cross-device negatives, GradCache) under pjit.

Parity with the reference DRTrainer.training_step
(/root/reference/src/openmatch/trainer/dense_trainer.py:202-459):
  * scores = q_global @ p_globalᵀ / softmax_temperature (τ=0.02 paper config);
  * target[i] = i * n_passages (one positive among n_passages per query);
  * loss = mean CE over the GLOBAL batch. The reference's ×world_size
    correction exists only to undo DDP grad averaging — under pjit the global
    mean is computed once, so no correction is needed and the effective
    gradient is identical;
  * accuracy = argmax(scores) == target.

Cross-device negatives: with the batch sharded over (replica, data), the
q·pᵀ matmul inside jit IS the all-gather — XLA inserts the collectives from
the shardings, and gradients flow through them automatically (the reference
needed a manual grad-splice, dense_trainer.py:360-363).

GradCache (reference re-impl :249-417) becomes a two-pass jit program:
  pass 1: encode micro-batches under stop_grad (lax.map) → all reps;
  pass 2: d(loss)/d(reps) is a cheap matmul; per-micro-batch VJPs against the
  cached rep-grads accumulate the param gradient via lax.scan (one
  micro-batch of activations live at a time). Dropout replay is exact via the
  same PRNG key per micro-batch in both passes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ContrastiveConfig:
    temperature: float = 0.02
    n_passages: int = 1
    passage_stop_grad: bool = False


def contrastive_loss(q_reps: jax.Array, p_reps: jax.Array,
                     cfg: ContrastiveConfig) -> Tuple[jax.Array, dict]:
    """q_reps (B, D); p_reps (B*n_passages, D) — both already global.
    Returns (loss, metrics)."""
    if cfg.passage_stop_grad:
        p_reps = jax.lax.stop_gradient(p_reps)
    scores = jnp.einsum("qd,pd->qp", q_reps.astype(jnp.float32),
                        p_reps.astype(jnp.float32)) / cfg.temperature
    target = jnp.arange(scores.shape[0], dtype=jnp.int32) * cfg.n_passages
    logz = jax.nn.logsumexp(scores, axis=1)
    gold = jnp.take_along_axis(scores, target[:, None], axis=1)[:, 0]
    loss = jnp.mean(logz - gold)
    accuracy = jnp.mean((jnp.argmax(scores, axis=1) == target).astype(jnp.float32))
    return loss, {"accuracy": accuracy, "loss": loss}


def direct_loss_fn(encode: Callable, cfg: ContrastiveConfig):
    """loss(params, q_batch, p_batch, rngs) for the non-GradCache path.
    `encode(params, batch, rng)` → (B, D) reps."""

    def fn(params, q_batch, p_batch, rng):
        rq, rp = jax.random.split(rng)
        q_reps = encode(params, q_batch, rq)
        p_reps = encode(params, p_batch, rp)
        return contrastive_loss(q_reps, p_reps, cfg)

    return fn


def gradcache_grad_fn(encode: Callable, cfg: ContrastiveConfig,
                      num_micro: int):
    """Returns fn(params, q_micro, p_micro, rng) → ((loss, metrics), grads)
    where q_micro/p_micro are stacked (num_micro, micro, ...) pytrees.

    Two-pass GradCache: O(micro) activation memory for any global batch size.
    """

    def fn(params, q_micro, p_micro, rng):
        rngs = jax.random.split(rng, num_micro * 2).reshape(num_micro, 2, -1)

        # ---- pass 1: representations without activation storage ----
        def enc_pair(mb):
            qb, pb, r = mb
            return (jax.lax.stop_gradient(encode(params, qb, r[0])),
                    jax.lax.stop_gradient(encode(params, pb, r[1])))

        q_r, p_r = jax.lax.map(enc_pair, (q_micro, p_micro, rngs))
        q_reps = q_r.reshape(-1, q_r.shape[-1])
        p_reps = p_r.reshape(-1, p_r.shape[-1])

        # ---- loss + rep-grads (cheap) ----
        (loss, metrics), (gq, gp) = jax.value_and_grad(
            contrastive_loss, argnums=(0, 1), has_aux=True)(q_reps, p_reps, cfg)
        gq = gq.reshape(q_r.shape)
        gp = gp.reshape(p_r.shape)

        # ---- pass 2: recompute each micro-batch WITH grad, vjp vs cache ----
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

        def accum(carry, xs):
            qb, pb, r, gq_i, gp_i = xs

            def both(p):
                return encode(p, qb, r[0]), encode(p, pb, r[1])

            _, vjp = jax.vjp(both, params)
            (g,) = vjp((gq_i, gp_i))
            return jax.tree_util.tree_map(jnp.add, carry, g), None

        grads, _ = jax.lax.scan(accum, zero_grads,
                                (q_micro, p_micro, rngs, gq, gp))
        return (loss, metrics), grads

    return fn


def stack_micro_batches(batch, num_micro: int):
    """Split a batch pytree along dim 0 into (num_micro, micro, ...) stacks."""
    def split(x):
        assert x.shape[0] % num_micro == 0, (x.shape, num_micro)
        return x.reshape(num_micro, x.shape[0] // num_micro, *x.shape[1:])
    return jax.tree_util.tree_map(split, batch)
