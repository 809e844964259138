"""Device-side input pipeline: finish raw encode batches inside the jit.

The SURVEY throughput recipe (§7.3) calls for a fused host→HBM input
pipeline. Host work stops at uint8 patch extraction + tiny factorized pos
operators (pipeline.build_encode_batch(device_mode=True)); this module's
`finish_encode_batch` runs under jit and does

  * ToTensor + Inception normalization (uint8 → f32, (x/255 − .5)/.5) —
    fused by XLA into the patch-embed matmul's input;
  * the bicubic pos-resample outer product pos_matrix[p] = A[p] ⊗ B[p]
    (transform.pos_factor_rows), reconstructing the dense operator on
    device instead of shipping 27× the bytes.

Outputs are bit-compatible with the classic host-built EncodeBatch up to
f32 rounding of the outer product.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.visrag_ret import EncodeBatch


def finish_encode_batch(raw: dict) -> EncodeBatch:
    """raw: dict from build_encode_batch(device_mode=True), as device arrays
    (uint8 pixels pass through jnp.asarray unchanged). Jittable."""
    pixels = jnp.asarray(raw["pixels"])
    patches = (pixels.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    pos_a = jnp.asarray(raw["pos_a"])
    pos_b = jnp.asarray(raw["pos_b"])
    n, p, g = pos_a.shape
    pos_matrix = jnp.einsum("npa,npb->npab", pos_a, pos_b).reshape(n, p,
                                                                   g * g)
    return EncodeBatch(
        input_ids=jnp.asarray(raw["input_ids"]),
        attention_mask=jnp.asarray(raw["attention_mask"]),
        patches=patches, patch_mask=jnp.asarray(raw["patch_mask"]),
        pos_matrix=pos_matrix, grid_h=jnp.asarray(raw["grid_h"]),
        grid_w=jnp.asarray(raw["grid_w"]),
        slot_map=jnp.asarray(raw["slot_map"]))
