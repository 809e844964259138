"""Device-side input pipeline: finish raw encode batches inside the jit.

The SURVEY throughput recipe (§7.3) calls for a fused host→HBM input
pipeline. Host work stops at uint8 patch extraction + per-slice grid dims
(pipeline.build_encode_batch(device_mode=True)); this module's
`finish_encode_batch` runs under jit and does

  * ToTensor + Inception normalization (uint8 → f32, (x/255 − .5)/.5) —
    fused by XLA into the patch-embed matmul's input;
  * the bicubic pos-resample operator, built ON DEVICE from
    (grid_h, grid_w) + the `bicubic_table` compile-time constant
    (transform.bicubic_table): two gathers pick the per-patch 1-D factors
    A[p] = T[gh, p // gw], B[p] = T[gw, p % gw], then the outer product
    A ⊗ B reconstructs the dense operator. The batch ships NO pos arrays —
    at the bench shape that is 28 MB/batch of host→device traffic and the
    pos_factor host work gone.

Outputs are bit-compatible with the classic host-built EncodeBatch up to
f32 rounding of the outer product (the table holds the same torch-parity
1-D operators the host path used).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.visrag_ret import EncodeBatch
from .transform import bicubic_table


def finish_encode_batch(raw: dict, pos_table=None,
                        src_grid: int = 27) -> EncodeBatch:
    """raw: dict from build_encode_batch(device_mode=True), as device arrays
    (uint8 pixels pass through jnp.asarray unchanged). Jittable.

    pos_table: (max_dst+1, max_dst, src_grid) numpy/jnp constant from
    transform.bicubic_table — pass it from OUTSIDE the jit (a closure
    constant) so it is embedded in the program, not shipped per batch.
    Defaults to bicubic_table(src_grid) (src_grid must then match the
    model's pos grid). Legacy raw dicts carrying pos_a/pos_b still work.
    """
    pixels = jnp.asarray(raw["pixels"])
    patches = (pixels.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    if "pos_a" in raw:          # legacy factorized-host path
        pos_a = jnp.asarray(raw["pos_a"])
        pos_b = jnp.asarray(raw["pos_b"])
        n, p, g = pos_a.shape
        pos_matrix = jnp.einsum("npa,npb->npab", pos_a, pos_b).reshape(
            n, p, g * g)
    else:
        table = jnp.asarray(pos_table if pos_table is not None
                            else bicubic_table(src_grid))
        pos_matrix = _pos_operators(table, jnp.asarray(raw["grid_h"]),
                                    jnp.asarray(raw["grid_w"]),
                                    pixels.shape[1])
    return EncodeBatch(
        input_ids=jnp.asarray(raw["input_ids"]),
        attention_mask=jnp.asarray(raw["attention_mask"]),
        patches=patches, patch_mask=jnp.asarray(raw["patch_mask"]),
        pos_matrix=pos_matrix, grid_h=jnp.asarray(raw["grid_h"]),
        grid_w=jnp.asarray(raw["grid_w"]),
        slot_map=jnp.asarray(raw["slot_map"]))


def _pos_operators(table, gh, gw, p):
    """Dense per-slice pos-resample operators built ON DEVICE from the
    bicubic table constant: A[p] = T[gh, p // gw], B[p] = T[gw, p % gw],
    outer product → (N, P, G²). Shared by finish_encode_batch (retriever
    encode) and finish_vision_batch (generation) — one implementation of
    relay/Mosaic-sensitive math."""
    maxd = table.shape[1]
    g = table.shape[2]
    rows = jnp.arange(p, dtype=jnp.int32)
    gw_safe = jnp.maximum(gw, 1)[:, None]
    ih = jnp.minimum(rows[None, :] // gw_safe, maxd - 1)
    iw = jnp.minimum(rows[None, :] % gw_safe, maxd - 1)
    valid = (rows[None, :] < (gh * gw)[:, None])
    pos_a = table[gh[:, None], ih] * valid[..., None]
    pos_b = table[gw[:, None], iw]
    return jnp.einsum("npa,npb->npab", pos_a, pos_b).reshape(
        pos_a.shape[0], p, g * g)


_TABLE_CACHE = {}


def cached_bicubic_table(src_grid: int):
    """Per-process cache of the bicubic operator stack (18 MB at grid 70) —
    treat the returned array as immutable."""
    if src_grid not in _TABLE_CACHE:
        _TABLE_CACHE[src_grid] = bicubic_table(src_grid)
    return _TABLE_CACHE[src_grid]


def finish_vision_batch(raw: dict, pos_table=None,
                        src_grid: int = 27) -> dict:
    """Vision-only device finisher: raw {pixels uint8, patch_mask, grid_h,
    grid_w} → {patches f32, pos_matrix, …} for the generation composites
    (MiniCPM-V 2.6 — at its 70² pos grid the host-built dense pos matrices
    are ~23 MB fp32 per slice, so generation batches ship uint8 pixels and
    build operators here). Jittable; same math as finish_encode_batch."""
    pixels = jnp.asarray(raw["pixels"])
    patches = (pixels.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    table = jnp.asarray(pos_table if pos_table is not None
                        else cached_bicubic_table(src_grid))
    gh = jnp.asarray(raw["grid_h"])
    gw = jnp.asarray(raw["grid_w"])
    pos_matrix = _pos_operators(table, gh, gw, pixels.shape[1])
    return {"patches": patches, "patch_mask": jnp.asarray(raw["patch_mask"]),
            "pos_matrix": pos_matrix, "grid_h": gh, "grid_w": gw}
