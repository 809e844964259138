"""Sequence parallelism: Ulysses all_to_all attention == single-device
attention, forward and gradients, on the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from visrag_tpu.config import MeshConfig
from visrag_tpu.mesh import SEQ, build_mesh
from visrag_tpu.ops.attention import mha_reference
from visrag_tpu.parallel.ulysses import (pad_seq_for_ulysses,
                                         ulysses_attention, validate_heads)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_reference(causal):
    mesh = build_mesh(MeshConfig(data=2, seq=4))
    b, s, h, d = 2, 64, 8, 16
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, d))
    k = jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d))
    lengths = jnp.array([64, 40], jnp.int32)
    seg = (jnp.arange(s)[None] < lengths[:, None]).astype(jnp.int32)

    ref = mha_reference(q, k, v, seg, seg, causal=causal)

    fn = jax.shard_map(
        lambda q, k, v: ulysses_attention(q, k, v, q_seg=seg, kv_seg=seg,
                                          causal=causal),
        mesh=mesh,
        in_specs=(P(None, SEQ), P(None, SEQ), P(None, SEQ)),
        out_specs=P(None, SEQ), check_vma=False)
    out = jax.jit(fn)(q, k, v)
    valid = np.asarray(seg).astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-4, atol=2e-4)


def test_ulysses_gradients():
    mesh = build_mesh(MeshConfig(data=2, seq=4))
    b, s, h, d = 1, 32, 8, 8
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (b, s, h, d))

    def loss_sp(q):
        fn = jax.shard_map(
            lambda q: ulysses_attention(q, q, q, causal=True),
            mesh=mesh, in_specs=P(None, SEQ), out_specs=P(None, SEQ),
            check_vma=False)
        return jnp.sum(jnp.tanh(fn(q)))

    def loss_ref(q):
        return jnp.sum(jnp.tanh(mha_reference(q, q, q, causal=True)))

    g_sp = jax.grad(loss_sp)(q)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


def test_pad_and_validate():
    x = jnp.ones((1, 10, 4, 8))
    padded, orig = pad_seq_for_ulysses(x, 4)
    assert padded.shape[1] == 12 and orig == 10
    validate_heads(8, 4)
    with pytest.raises(ValueError):
        validate_heads(6, 4)
