"""LoRA adapters for the retriever (weight-merge formulation).

Parity role: the reference's optional peft LoRA on the DR model
(/root/reference/src/openmatch/modeling/dense_retrieval_model.py:327-345:
target_modules=["q_proj", "v_proj"], r=32, lora_alpha=64, dropout-free at
encode time).

TPU-first design: instead of grafting adapter modules into every attention
layer (a module-surgery port), LoRA lives entirely in the PARAM TREE —
`lora_init` builds low-rank (A, B) factors for every targeted kernel and
`lora_merge` computes effective = base + (alpha/r)·(BᵀAᵀ)ᵀ inside the jitted
step. The base tree is frozen (no optimizer state, no grads); XLA fuses the
rank-r update into the surrounding graph, and the merge cost (r·(in+out)
MACs per weight) is negligible next to one forward. Gradients flow to A/B
automatically through the merge — no custom plumbing.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ("q_proj", "v_proj")


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def lora_init(rng, base_params, *, targets: Sequence[str] = DEFAULT_TARGETS,
              rank: int = 32) -> dict:
    """Build the trainable LoRA tree: for every 2-D `weight` (out, in) whose
    module path contains a target name, A (r, in) ~ N(0, 0.02) and
    B (out, r) = 0 (so the adapter starts as the identity delta)."""
    lora: dict = {}
    for path, leaf in _flatten(base_params):
        if path[-1] != "weight" or np.ndim(leaf) != 2:
            continue
        if not any(t in p for t in targets for p in path[:-1]):
            continue
        out_f, in_f = leaf.shape
        rng, r1 = jax.random.split(rng)
        _set(lora, path[:-1] + ("lora_a",),
             jax.random.normal(r1, (rank, in_f), jnp.float32) * 0.02)
        _set(lora, path[:-1] + ("lora_b",),
             jnp.zeros((out_f, rank), jnp.float32))
    if not lora:
        raise ValueError(f"no kernels matched LoRA targets {targets}")
    return lora


def lora_merge(base_params, lora_params, *, rank: int = 32,
               alpha: float = 64.0):
    """effective = base + (alpha/r)·B@A for every adapted kernel."""
    scale = alpha / rank

    def deep(tree):
        if isinstance(tree, dict):
            return {k: deep(v) for k, v in tree.items()}
        return tree

    def walk(base, lora):
        for k, v in lora.items():
            if isinstance(v, dict):
                walk(base[k], v)
        if "lora_a" in lora:
            delta = (lora["lora_b"] @ lora["lora_a"]) * scale
            base["weight"] = base["weight"] + delta.astype(
                base["weight"].dtype)

    merged = deep(base_params)
    walk(merged, lora_params)
    return merged


def wrap_encode_with_lora(encode: Callable, base_params, *,
                          rank: int = 32, alpha: float = 64.0
                          ) -> Callable:
    """encode(params, batch, rng) → encode_lora(lora_tree, batch, rng): the
    trainer optimizes ONLY the LoRA tree; the frozen base is closed over
    (replicated/FSDP-sharded once, no optimizer state)."""
    def encode_lora(lora_tree, batch, rng):
        return encode(lora_merge(base_params, lora_tree, rank=rank,
                                 alpha=alpha), batch, rng)
    return encode_lora


def lora_param_count(lora_tree) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(lora_tree))
