"""MiniCPM RoPE scaling (linear / dynamic-NTK) parity vs the reference
rotary-embedding classes (modeling_minicpm.py:142-291), AST-extracted as
torch oracles."""

import numpy as np
import pytest

from visrag_tpu.models.common import apply_rope, rope_frequencies

torch = pytest.importorskip("torch")
from ref_oracle import load_functions  # noqa: E402

DIM = 32
MAXPOS = 128


@pytest.fixture(scope="module")
def oracle_classes():
    ns = load_functions(
        "src/openmatch/modeling/modeling_minicpmv/modeling_minicpm.py",
        ["MiniCPMRotaryEmbedding", "MiniCPMLinearScalingRotaryEmbedding",
         "MiniCPMDynamicNTKScalingRotaryEmbedding"],
        extra_ns={"torch": torch, "nn": torch.nn})
    return ns


def _ours_cos_sin(scaling, seq_len):
    inv_freq = rope_frequencies(DIM, 10000.0, scaling=scaling,
                                max_positions=MAXPOS, seq_len=seq_len)
    pos = np.arange(seq_len, dtype=np.float32)
    if scaling and scaling.get("type") == "linear":
        pos = pos / float(scaling["factor"])
    freqs = pos[:, None] * inv_freq[None, :]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb), np.sin(emb)


@pytest.mark.parametrize("seq_len", [64, 300])
def test_linear_scaling_matches_reference(oracle_classes, seq_len):
    ref = oracle_classes["MiniCPMLinearScalingRotaryEmbedding"](
        DIM, max_position_embeddings=MAXPOS, scaling_factor=2.0)
    x = torch.zeros(1, 1, seq_len, DIM)
    cos_r, sin_r = ref.forward(x, seq_len=seq_len)
    cos_o, sin_o = _ours_cos_sin({"type": "linear", "factor": 2.0}, seq_len)
    np.testing.assert_allclose(cos_o, cos_r.numpy(), rtol=1e-5, atol=5e-5)
    np.testing.assert_allclose(sin_o, sin_r.numpy(), rtol=1e-5, atol=5e-5)


@pytest.mark.parametrize("seq_len", [64, 300, 1024])
def test_dynamic_ntk_matches_reference(oracle_classes, seq_len):
    ref = oracle_classes["MiniCPMDynamicNTKScalingRotaryEmbedding"](
        DIM, max_position_embeddings=MAXPOS, scaling_factor=2.0)
    x = torch.zeros(1, 1, seq_len, DIM)
    cos_r, sin_r = ref.forward(x, seq_len=seq_len)
    cos_o, sin_o = _ours_cos_sin({"type": "dynamic", "factor": 2.0}, seq_len)
    np.testing.assert_allclose(cos_o, cos_r.numpy(), rtol=1e-5, atol=5e-5)
    np.testing.assert_allclose(sin_o, sin_r.numpy(), rtol=1e-5, atol=5e-5)


def test_unscaled_matches_reference(oracle_classes):
    ref = oracle_classes["MiniCPMRotaryEmbedding"](
        DIM, max_position_embeddings=MAXPOS)
    x = torch.zeros(1, 1, 64, DIM)
    cos_r, sin_r = ref.forward(x, seq_len=64)
    cos_o, sin_o = _ours_cos_sin(None, 64)
    np.testing.assert_allclose(cos_o, cos_r.numpy(), rtol=1e-5, atol=5e-5)
    np.testing.assert_allclose(sin_o, sin_r.numpy(), rtol=1e-5, atol=5e-5)


def test_unknown_scaling_type_raises():
    with pytest.raises(ValueError, match="rope_scaling"):
        rope_frequencies(DIM, scaling={"type": "yarn", "factor": 2.0},
                         seq_len=64)


def test_dynamic_ntk_inv_freq_matches_static_per_row():
    """Traced per-row NTK inv_freq == the static oracle-parity table at
    each row's length."""
    import jax.numpy as jnp
    from visrag_tpu.models.common import dynamic_ntk_inv_freq
    lens = np.array([64, 300, 1024], np.int32)
    got = np.asarray(dynamic_ntk_inv_freq(DIM, 10000.0, 2.0, MAXPOS,
                                          jnp.asarray(lens)))
    for i, length in enumerate(lens):
        want = rope_frequencies(DIM, 10000.0,
                                scaling={"type": "dynamic", "factor": 2.0},
                                max_positions=MAXPOS, seq_len=int(length))
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-7)


def test_dynamic_ntk_decode_consistent_with_full_forward():
    """A short sequence in an oversized KV buffer must NOT trigger the NTK
    rescale: one decode step == the full forward's last-token logits.
    (Regression: the decode path used to key theta off the KV-buffer
    CAPACITY, rotating q with a rescaled theta while prompt K was not.)"""
    import jax
    import jax.numpy as jnp
    from visrag_tpu.models.minicpm import (MiniCPMConfig, MiniCPMForGeneration,
                                           MiniCPMGenConfig)
    cfg = MiniCPMGenConfig(llm=MiniCPMConfig.tiny(
        max_position_embeddings=16, rope_scaling_type="dynamic",
        rope_scaling_factor=2.0))
    model = MiniCPMForGeneration(cfg)
    s, cap, nxt = 8, 64, 42
    ids = np.arange(1, s + 1, dtype=np.int32)[None]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    full = np.concatenate([ids, [[nxt]]], axis=1)
    logits_full, _ = model.apply(params, jnp.asarray(full))
    _, k, v = model.apply(params, jnp.asarray(ids), method=model.prefill)
    layers = k.shape[0]

    def to_cache(src):   # (1, s, kvh, d) → (1, cap, kvh, d)
        buf = jnp.zeros((1, cap) + src.shape[2:], src.dtype)
        return buf.at[:, :s].set(src)

    kc = tuple(to_cache(k[i]) for i in range(layers))
    vc = tuple(to_cache(v[i]) for i in range(layers))
    dlg, _, _ = model.apply(params, jnp.asarray([[nxt]], jnp.int32),
                            jnp.asarray([[s]], jnp.int32), kc, vc,
                            jnp.asarray([s + 1], jnp.int32),
                            method=model.decode)
    np.testing.assert_allclose(np.asarray(dlg[0]),
                               np.asarray(logits_full[0, -1]),
                               rtol=2e-4, atol=2e-4)


def test_apply_rope_linear_divides_positions():
    """End-to-end: linear scaling at factor f on positions p equals unscaled
    rope at positions p/f."""
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 8, 2, DIM).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 8, 2, DIM).astype(np.float32))
    pos = jnp.arange(8)[None, :] * 4
    inv = jnp.asarray(rope_frequencies(DIM))
    q1, k1 = apply_rope(q, k, pos, inv, scaling={"type": "linear",
                                                 "factor": 4.0})
    q2, k2 = apply_rope(q, k, pos // 4, inv)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                               rtol=1e-5, atol=1e-6)
