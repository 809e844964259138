"""Ring attention: context parallelism over the mesh `seq` axis.

Beyond-reference (SURVEY §2.6 lists it as the TPU-idiomatic alternative the
reference lacks): sequences shard over the `seq` axis; K/V shards rotate
around the ring with `lax.ppermute` over ICI while each device accumulates
its queries' attention online (log-sum-exp combination across ring steps).
Peak memory per device is O(S/n · S/n) scores and the K/V shard in flight —
long contexts that cannot fit one chip's attention run unchanged.

Gradients come for free: the program is pure jnp + ppermute under shard_map,
so jax.grad differentiates it (ppermute transposes to the reverse ring).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..mesh import SEQ


def _local_attend(q, k, v, allow, sm_scale):
    """One ring step's partial attention. q (B,Sq,H,D), k/v (B,Sk,H,D),
    allow (B, Sq, Sk) bool. → (num (B,Sq,H,D) f32, m, l (B,Sq,H))."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(allow[:, None], s, -1e30)
    m = jnp.max(s, axis=-1)                                # (B,H,Sq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    num = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return num, jnp.moveaxis(m, 1, 2), jnp.moveaxis(l, 1, 2)


def ring_attention(q, k, v, mesh: Mesh, *, causal: bool = False,
                   segment_ids=None, sm_scale: Optional[float] = None):
    """q/k/v (B, S, H, D) with S sharded over the mesh `seq` axis. Returns
    (B, S, H, D) attention output, numerically equal to full attention.

    segment_ids (B, S) int32 gives packed-sequence masking (0 = padding,
    visibility only within equal ids) — the segment slice rotates around the
    ring with its K/V shard, so packed RL batches can context-parallelize.
    """
    b, s_full, h, d = q.shape
    n = mesh.shape[SEQ]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    assert s_full % n == 0, (s_full, n)
    s_loc = s_full // n
    if segment_ids is None:
        segment_ids = jnp.ones((b, s_full), jnp.int32)

    def local(q, k, v, seg):
        bl = q.shape[0]                      # local batch (B / replica·data)
        idx = jax.lax.axis_index(SEQ)
        q_pos = idx * s_loc + jnp.arange(s_loc)
        q_seg = seg

        def step(t, carry):
            k_t, v_t, seg_t, acc, m, l = carry
            src = (idx - t) % n                  # whose shard we hold now
            kv_pos = src * s_loc + jnp.arange(s_loc)
            allow = (q_seg[:, :, None] == seg_t[:, None, :]) & \
                (q_seg[:, :, None] > 0)
            if causal:
                allow = allow & (q_pos[:, None] >= kv_pos[None, :])[None]
            num, m_blk, l_blk = _local_attend(q, k_t, v_t, allow, sm_scale)
            m_new = jnp.maximum(m, m_blk)
            c_old = jnp.exp(m - m_new)
            c_blk = jnp.exp(m_blk - m_new)
            acc = acc * c_old[..., None] + num * c_blk[..., None]
            l = l * c_old + l_blk * c_blk
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_t = jax.lax.ppermute(k_t, SEQ, perm)
            v_t = jax.lax.ppermute(v_t, SEQ, perm)
            seg_t = jax.lax.ppermute(seg_t, SEQ, perm)
            return k_t, v_t, seg_t, acc, m_new, l

        acc0 = jnp.zeros((bl, s_loc, h, d), jnp.float32)
        m0 = jnp.full((bl, s_loc, h), -1e30, jnp.float32)
        l0 = jnp.zeros((bl, s_loc, h), jnp.float32)
        carry = (k, v, seg, acc0, m0, l0)
        carry = jax.lax.fori_loop(0, n, step, carry)
        _, _, _, acc, m, l = carry
        return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)

    # batch rides the (replica, data) axes so a DP-sharded train batch needs
    # no gather; a data=1 mesh (the unit tests) degenerates to the old spec
    spec = P(("replica", "data"), SEQ, None, None)
    sspec = P(("replica", "data"), SEQ)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec, sspec),
                     out_specs=spec, check_rep=False)(q, k, v, segment_ids)
