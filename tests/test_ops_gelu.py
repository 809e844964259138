"""fast_gelu: bf16-exact erf GELU (ops/gelu.py).

Exhaustive: every finite normal bf16 input must round to the same bf16 as the
cancellation-free float64 ground truth. (The reference vision tower uses
exact-erf GELU — timm nn.GELU, vision_transformer.py:272 — NOT the tanh
approximation, which differs on 322 bf16 inputs.)
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visrag_tpu.ops.gelu import fast_gelu


def _to_bf16_np(a):
    a32 = np.asarray(a, np.float32).view(np.uint32)
    r = ((a32 + 0x7FFF + ((a32 >> 16) & 1)) >> 16).astype(np.uint16)
    return (r.astype(np.uint32) << 16).view(np.float32)


def _ref_gelu_f64(x64):
    """gelu via erfc on the negative side — no 1+erf cancellation in the tail."""
    from scipy.special import erfc
    gneg = -0.5 * np.abs(x64) * erfc(np.abs(x64) / math.sqrt(2))
    return np.where(x64 > 0, x64 + gneg, gneg)


def test_fast_gelu_bf16_exhaustive():
    pytest.importorskip("scipy")
    u16 = np.arange(65536, dtype=np.uint16)
    f32 = (u16.astype(np.uint32) << 16).view(np.float32)
    xb = jnp.asarray(f32).astype(jnp.bfloat16)
    out = np.asarray(jax.jit(fast_gelu)(xb).astype(jnp.float32))

    ref = _ref_gelu_f64(f32.astype(np.float64))
    refb = _to_bf16_np(np.where(np.isfinite(ref), ref, 0))
    minnorm = 2.0 ** -126
    finite = np.isfinite(f32)
    # subnormal in/out is backend flush-to-zero territory (XLA's own gelu
    # flushes there too); the exactness claim covers the normal range
    normal = finite & (np.abs(f32) >= minnorm) & (np.abs(ref) >= minnorm)
    neq = (out[normal] != refb[normal]) & ~((out[normal] == 0) &
                                            (refb[normal] == 0))
    assert neq.sum() == 0, f32[normal][neq][:20]

    # specials
    assert np.asarray(fast_gelu(jnp.bfloat16(float("inf"))),
                      np.float32) == np.inf
    assert float(fast_gelu(jnp.bfloat16(float("-inf")))) == 0.0
    assert math.isnan(float(fast_gelu(jnp.bfloat16(float("nan")))))


def test_fast_gelu_fp32_close():
    """fp32 path: not bit-exact-claimed, but ≤2e-7 abs/rel of float64."""
    pytest.importorskip("scipy")
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(scale=s, size=20_000).astype(np.float32)
                        for s in (0.5, 2.0, 8.0)])
    out = np.asarray(fast_gelu(jnp.asarray(x)), np.float64)
    ref = _ref_gelu_f64(x.astype(np.float64))
    err = np.abs(out - ref) / np.maximum(np.abs(ref), 1.0)
    assert err.max() < 2e-6, err.max()


def test_fast_gelu_grad_matches_xla():
    """VJP flows through the piecewise formula; matches XLA's gelu grad."""
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    g1 = jax.vmap(jax.grad(lambda t: fast_gelu(t)))(x)
    g2 = jax.vmap(jax.grad(lambda t: jax.nn.gelu(t, approximate=False)))(x)
    # the polynomial's derivative is not minimaxed — ~3e-5 abs at the
    # |u|=2 branch seam is expected and harmless for training
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=5e-5)
