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
