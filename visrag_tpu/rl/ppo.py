"""Dual-clip PPO objective with reward-scoped masks (RS-GRPO core), KL
penalties, and loss averaging — in JAX for use inside the pjit train step.

Parity with /root/reference/src/rsgrpo/verl/trainer/core_algos.py:362-562 and
the actor's cross-device token normalization (dp_actor.py:286-288):

  pg_loss   = dual-clip PPO on ratio broadcast against
              advantages[:, :, None] * reward_masks (bs, n_rewards, len);
  per-channel "router" averaging → (n_rewards,);
  final      = Σ_ch loss_ch · local_tokens_ch / global_tokens_ch
               / count(loss_ch ≠ 0)
  (the reference's ×world_size factor cancels under psum-mean semantics; the
  global token totals are psums over the data axis when axis_name is given).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def log_probs_from_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """(B, S, V), (B, S) → (B, S) log p(label). fp32 logsumexp (the
    flash-attn fused CE role, torch_functional.py:38-70)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return gold - logz


def chunked_token_log_probs(head_fn, hidden: jax.Array, labels: jax.Array,
                            chunk: int = 512) -> jax.Array:
    """(B, S, H) hidden + (B, S) labels → (B, S) log p(label) WITHOUT ever
    materializing the (B, S, V) logits (the flash-attn fused linear+CE
    role, torch_functional.py:38-70 — at the reference's 15k-token RL
    geometry a full-seq f32 logits buffer is ~20 GB and cannot compile on
    a 16 GB chip). lax.map over sequence chunks; jax.checkpoint on the
    per-chunk head so the BACKWARD also recomputes one chunk's logits at a
    time (fwd+bwd peak = one (B, chunk, V) buffer). head_fn: (B, K, H) →
    (B, K, V) logits (differentiable — lm_head grads accumulate across
    chunks through the scan)."""
    B, S, H = hidden.shape
    # chunk size balancing memory (≤ `chunk`) against pad waste: split S
    # into ceil(S/chunk) equal lane-aligned pieces
    n = -(-S // chunk)
    c = -(-(-(-S // n)) // 128) * 128
    pad = n * c - S
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
    hid = hidden.reshape(B, n, c, H).transpose(1, 0, 2, 3)
    lab = labels.reshape(B, n, c).transpose(1, 0, 2)

    @jax.checkpoint
    def one(args):
        h, l = args
        logits = head_fn(h)
        logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
        gold = jnp.take_along_axis(logits, l[..., None], axis=-1)[..., 0]
        return gold.astype(jnp.float32) - logz

    out = jax.lax.map(one, (hid, lab))              # (n, B, c)
    out = out.transpose(1, 0, 2).reshape(B, n * c)
    return out[:, :S]


def masked_mean(x, mask, eps: float = 1e-8):
    return jnp.sum(x * mask) / (jnp.sum(mask) + eps)


def average_loss(values, mask, mode: str = "token", eps: float = 1e-8):
    """core_algos.py:362-388. 'router' → per-channel means (n_rewards,)."""
    if mode == "router":
        return jnp.sum(values * mask, axis=(0, 2)) / (jnp.sum(mask, axis=(0, 2)) + eps)
    if mode == "token":
        return masked_mean(values, mask, eps)
    if mode == "seq":
        return jnp.mean(jnp.sum(values * mask, -1) / (jnp.sum(mask, -1) + eps))
    raise ValueError(mode)


def compute_policy_loss(old_log_probs, log_probs, advantages, response_mask,
                        reward_masks, *, clip_ratio_low=0.2,
                        clip_ratio_high=0.3, clip_ratio_dual=3.0):
    """core_algos.compute_policy_loss (:391-472).

    old_log_probs/log_probs (bs, len); advantages (bs, n_rewards) — or
    (bs, n_rewards, len) when already scoped per token (the packed
    padding-free path precomputes advantage·mask before packing);
    reward_masks (bs, n_rewards, len). → (pg_loss (n_rewards,), metrics)."""
    import numpy as np

    if advantages.ndim == 3:
        adv = advantages                                         # (bs, n, len)
    else:
        adv = advantages[:, :, None] * reward_masks              # (bs, n, len)
    neg_kl = jnp.clip(log_probs - old_log_probs, -20.0, 20.0)[:, None, :]
    neg_kl = jnp.broadcast_to(neg_kl, adv.shape)
    ratio = jnp.exp(neg_kl)
    clipped_ratio = jnp.exp(jnp.clip(neg_kl, np.log(1.0 - clip_ratio_low),
                                     np.log(1.0 + clip_ratio_high)))

    pg1 = -adv * ratio
    pg2 = -adv * clipped_ratio
    pg3 = -adv * clip_ratio_dual
    clipped_higher = jnp.maximum(pg1, pg2)
    clipped_lower = jnp.minimum(clipped_higher, pg3)
    final = jnp.where(adv < 0, clipped_lower, clipped_higher)

    pg_loss = average_loss(final, reward_masks, mode="router")

    metrics = {
        "ppo_kl": masked_mean(-neg_kl, reward_masks),
        "pg_clipfrac_higher": masked_mean((pg1 < pg2).astype(jnp.float32),
                                          reward_masks),
        "pg_clipfrac_lower": masked_mean(
            ((clipped_higher > pg3) & (adv < 0)).astype(jnp.float32),
            reward_masks),
        "entropy_loss": masked_mean(-log_probs[:, None, :] *
                                    jnp.ones_like(reward_masks), reward_masks),
    }
    return pg_loss, metrics


def compute_kl(log_probs, ref_log_probs, kind: str = "low_var_kl"):
    """core_algos.compute_kl (:523-562)."""
    delta = log_probs - ref_log_probs
    if kind == "kl":
        return delta
    if kind == "abs":
        return jnp.abs(delta)
    if kind == "mse":
        return 0.5 * jnp.square(delta)
    if kind == "low_var_kl":
        d = jnp.clip(ref_log_probs - log_probs, -20.0, 20.0)
        return jnp.clip(jnp.exp(d) - d - 1.0, -10.0, 10.0)
    if kind == "full":
        raise NotImplementedError(
            "kl_penalty='full' is a deliberate wontfix (see BASELINE.md "
            "'full-KL' note): the reference's F.kl_div over the SEQUENCE "
            "dim of chosen-token logprobs (core_algos.py:559-560) is not a "
            "KL between distributions; use kl/abs/mse/low_var_kl")
    raise ValueError(kind)


def combine_channel_losses(pg_loss, reward_masks, *,
                           axis_name: Optional[str] = None,
                           total_tokens: Optional[jax.Array] = None):
    """Cross-device per-reward token normalization (dp_actor.py:237-238,
    :286-288): final = Σ_ch pg_ch · local_tok_ch / global_tok_ch / #nonzero.

    Under pjit/shard_map pass axis_name to psum the token totals; or pass
    precomputed global totals (n_rewards,)."""
    local = jnp.sum(reward_masks, axis=(0, 2)).astype(jnp.float32)
    if total_tokens is None:
        if axis_name is not None:
            total_tokens = jax.lax.psum(local, axis_name)
        else:
            total_tokens = local
    nz = jnp.sum((pg_loss != 0.0).astype(jnp.float32))
    return jnp.sum(pg_loss * local / jnp.maximum(total_tokens, 1.0)) / \
        jnp.maximum(nz, 1.0)


def compute_value_loss(vpreds, returns, values, response_mask, *,
                       cliprange_value: float = 0.5,
                       loss_avg_mode: str = "token"):
    """Clipped critic loss (core_algos.compute_value_loss :475-521).
    All args (bs, len) in the same (logp-shifted) alignment."""
    vpredclipped = jnp.clip(vpreds, values - cliprange_value,
                            values + cliprange_value)
    l1 = jnp.square(vpreds - returns)
    l2 = jnp.square(vpredclipped - returns)
    clipped = jnp.maximum(l1, l2)
    vf_loss = 0.5 * average_loss(clipped, response_mask, mode=loss_avg_mode)
    metrics = {
        "vf_clipfrac": masked_mean((l1 < l2).astype(jnp.float32),
                                   response_mask),
        "vpred_mean": masked_mean(vpreds, response_mask),
    }
    return vf_loss, metrics


# ---------------------------------------------------------------------------
# KL controllers + reward-side KL penalty (core_algos.py:38-103,
# ray_trainer.apply_kl_penalty :110-127)
# ---------------------------------------------------------------------------


class FixedKLController:
    def __init__(self, init_kl_coef: float):
        self.kl_coef = init_kl_coef

    def update(self, current_kl: float, n_steps: int):
        pass


class AdaptiveKLController:
    """Adaptive controller from arXiv:1909.08593 (core_algos.py:48-62)."""

    def __init__(self, init_kl_coef: float, target_kl: float, horizon: float):
        self.kl_coef = init_kl_coef
        self.target = target_kl
        self.horizon = horizon

    def update(self, current_kl: float, n_steps: int):
        proportional_error = float(
            jnp.clip(current_kl / self.target - 1, -0.2, 0.2))
        self.kl_coef *= 1 + proportional_error * n_steps / self.horizon


def get_kl_controller(kl_type: str, kl_coef: float, kl_target: float = 0.1,
                      kl_horizon: float = 10000.0):
    if kl_type == "fixed":
        return FixedKLController(kl_coef)
    if kl_type == "adaptive":
        assert kl_horizon > 0, "horizon must be larger than 0"
        return AdaptiveKLController(kl_coef, kl_target, kl_horizon)
    raise ValueError(f"Unknown kl type: {kl_type}")


def apply_kl_penalty(token_scores, old_log_probs, ref_log_probs,
                     response_mask, kl_ctrl, kind: str = "kl"):
    """token_level_rewards = scores − kl_coef·KL(π, π_ref); updates the
    controller with the batch-mean sequence KL (ray_trainer.py:110-127).
    All arrays (bs, len), numpy, in the same alignment."""
    import numpy as np

    kld = np.asarray(compute_kl(jnp.asarray(old_log_probs),
                                jnp.asarray(ref_log_probs), kind))
    kld = kld * response_mask
    rewards = token_scores - kl_ctrl.kl_coef * kld
    seq_kl = kld.sum(-1) / np.maximum(response_mask.sum(-1), 1)
    current_kl = float(seq_kl.mean())
    metrics = {"critic/kl": current_kl, "critic/kl_coef": kl_ctrl.kl_coef}
    kl_ctrl.update(current_kl, token_scores.shape[0])
    return rewards.astype(np.float32), metrics


def ppo_loss(old_log_probs, log_probs, advantages, response_mask,
             reward_masks, *, ref_log_probs=None, kl_coef: float = 0.0,
             kl_type: str = "low_var_kl", clip_ratio_low=0.2,
             clip_ratio_high=0.3, clip_ratio_dual=3.0,
             axis_name: Optional[str] = None,
             total_tokens: Optional[jax.Array] = None):
    """Full actor objective → (scalar loss, metrics)."""
    pg, metrics = compute_policy_loss(
        old_log_probs, log_probs, advantages, response_mask, reward_masks,
        clip_ratio_low=clip_ratio_low, clip_ratio_high=clip_ratio_high,
        clip_ratio_dual=clip_ratio_dual)
    if ref_log_probs is not None and kl_coef > 0.0:
        kld = compute_kl(log_probs, ref_log_probs, kl_type)[:, None, :]
        kl_loss = average_loss(jnp.broadcast_to(kld, reward_masks.shape),
                               reward_masks, mode="router")
        pg = pg + kl_loss * kl_coef
        metrics = dict(metrics, kl_loss=jnp.mean(kl_loss))
    loss = combine_channel_losses(pg, reward_masks, axis_name=axis_name,
                                  total_tokens=total_tokens)
    return loss, metrics
