"""Reliable wall-clock measurement under the remote-TPU relay.

Pitfalls (verified empirically on the axon tunnel; see
.claude/skills/verify/SKILL.md):
  * jax.block_until_ready does NOT synchronize — always fetch data;
  * every program execution has a fixed ~45 ms host↔device round-trip, so
    per-op timing must amortize over many enqueued executions and fetch ONE
    tiny output at the end;
  * fetching large arrays is slow (~30 MB/s through the tunnel) — reduce to a
    scalar on device before fetching.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def measure(fn: Callable, *args, iters: int = 20, warmup: int = 2) -> float:
    """Seconds per execution of fn(*args), relay-latency corrected.

    fn's output is reduced to a scalar on device; `iters` executions are
    enqueued back-to-back and the final scalar fetched once.
    """
    scalar_fn = jax.jit(lambda *a: _to_scalar(fn(*a)))
    for _ in range(warmup):
        float(scalar_fn(*args)[()])
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = scalar_fn(*args)
    float(out[()])
    total = time.time() - t0
    # subtract one fixed round-trip (measured separately per session; 45 ms is
    # a good default for the axon relay, 0 elsewhere)
    overhead = _fixed_overhead()
    return max(total - overhead, 1e-9) / iters


_OVERHEAD_CACHE = None


def _fixed_overhead() -> float:
    """One enqueue-and-fetch of a trivial program ≈ the fixed latency."""
    global _OVERHEAD_CACHE
    if _OVERHEAD_CACHE is None:
        f = jax.jit(lambda x: jnp.sum(x))
        x = jnp.ones((8, 128), jnp.float32)
        float(f(x)[()])
        t0 = time.time()
        float(f(x)[()])
        _OVERHEAD_CACHE = time.time() - t0
    return _OVERHEAD_CACHE


def _to_scalar(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.mean(jnp.asarray(l, jnp.float32)) for l in leaves)
