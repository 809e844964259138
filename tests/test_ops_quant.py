"""int8 w8a8 path (ops/quant.py, QuantDense, SiglipViTConfig.quant)."""

import numpy as np
import jax
import jax.numpy as jnp

from visrag_tpu.ops.quant import (int8_dense, int8_matmul, quant_rowwise,
                                  quant_weight_colwise)


def _np_ref(x, w, bias=None):
    """Exact numpy mirror of the symmetric rowwise/colwise scheme."""
    xf = x.astype(np.float64)
    xs = np.maximum(np.abs(xf).max(axis=1, keepdims=True), 1e-8) / 127.0
    xq = np.clip(np.round(xf / xs), -127, 127)
    wf = w.astype(np.float64)
    ws = np.maximum(np.abs(wf).max(axis=0), 1e-8) / 127.0
    wq = np.clip(np.round(wf / ws[None, :]), -127, 127)
    y = (xq @ wq) * xs * ws[None, :]
    if bias is not None:
        y = y + bias[None, :]
    return y


def test_int8_dense_matches_reference_math():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 96)).astype(np.float32)
    w = (rng.normal(size=(96, 48)) * 0.1).astype(np.float32)
    b = rng.normal(size=(48,)).astype(np.float32)
    out = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                out_dtype=jnp.float32), np.float64)
    ref = _np_ref(x, w, b)
    # fp32 scale products vs fp64 reference: tiny epsilon only
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_int8_gemm_blocks_aligned_for_odd_shapes():
    """Clamped block dims are rounded up to the (8, 128) Mosaic tiling for
    m/n/k that are not multiples — and the padded result is still exact."""
    from visrag_tpu.ops.matmul_int8 import int8_matmul_fused
    from visrag_tpu.ops.quant import quant_rowwise, quant_weight_colwise
    rng = np.random.default_rng(9)
    m, k, n = 13, 200, 70              # none aligned; all < default blocks
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = (rng.normal(size=(k, n)) * 0.1).astype(np.float32)
    xq, xs = quant_rowwise(jnp.asarray(x))
    wq, ws = quant_weight_colwise(jnp.asarray(w))
    out = int8_matmul_fused(xq, xs, wq, ws, out_dtype=jnp.float32,
                            interpret=True)
    assert out.shape == (m, n)
    ref = _np_ref(x, w)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               rtol=1e-4, atol=1e-4)


def test_quant_training_config_rejected():
    """quant='int8' + remat=True (training) must be rejected at config time
    — int8 has no VJP and the XLA fallback's round() zeroes gradients."""
    import pytest
    from visrag_tpu.models.minicpm import MiniCPMConfig
    from visrag_tpu.models.siglip_vit import SiglipViTConfig
    with pytest.raises(ValueError):
        MiniCPMConfig.tiny(quant="int8", remat=True)
    with pytest.raises(ValueError):
        SiglipViTConfig.tiny(quant="int8", remat=True)


def test_int8_quant_roundtrip_error_bound():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 256)).astype(np.float32)
    q, s = quant_rowwise(jnp.asarray(x))
    back = np.asarray(q, np.float32) * np.asarray(s)
    # symmetric absmax: error <= scale/2 per element
    assert np.abs(back - x).max() <= np.asarray(s).max() / 2 + 1e-7


def test_int8_matmul_accuracy_at_model_scale():
    """Relative error of the w8a8 GEMM vs fp32 stays ~1% at ViT-like dims."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(128, 1152)).astype(np.float32)
    w = (rng.normal(size=(1152, 384)) * 0.03).astype(np.float32)
    exact = x @ w
    q = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w),
                              out_dtype=jnp.float32))
    rel = np.abs(q - exact) / np.maximum(np.abs(exact).mean(), 1e-6)
    assert np.median(rel) < 0.02, np.median(rel)


def test_vit_block_int8_cosine():
    """int8 ViT block output stays >0.995 cosine to the bf16 block."""
    from visrag_tpu.models.siglip_vit import SiglipViTConfig, ViTBlock
    rng = np.random.default_rng(3)
    cfg_b = SiglipViTConfig.tiny(embed_dim=64, num_heads=4, mlp_dim=128,
                                 dtype=jnp.float32)
    cfg_q = SiglipViTConfig.tiny(embed_dim=64, num_heads=4, mlp_dim=128,
                                 dtype=jnp.float32, quant="int8")
    x = jnp.asarray(rng.normal(size=(2, 24, 64)) * 0.3, jnp.float32)
    lengths = jnp.asarray([24, 17], jnp.int32)
    params = ViTBlock(cfg_b).init(jax.random.PRNGKey(0), x, lengths)
    out_b = np.asarray(ViTBlock(cfg_b).apply(params, x, lengths))
    out_q = np.asarray(ViTBlock(cfg_q).apply(params, x, lengths))
    a, b = out_b[0].ravel(), out_q[0].ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.995, cos


def test_vit_block_flat_matches_packed():
    """attn_impl='flat' (fused-qkv flat layout, transpose-free) == the
    packed path on identical params, bf16-free fp32 math."""
    import dataclasses
    from visrag_tpu.models.siglip_vit import SiglipViTConfig, ViTBlock
    rng = np.random.default_rng(7)
    cfg = SiglipViTConfig.tiny(embed_dim=64, num_heads=4, mlp_dim=128,
                               dtype=jnp.float32)
    cfg_f = dataclasses.replace(cfg, attn_impl="flat")
    x = jnp.asarray(rng.normal(size=(3, 24, 64)) * 0.3, jnp.float32)
    lengths = jnp.asarray([24, 17, 9], jnp.int32)
    params = ViTBlock(cfg).init(jax.random.PRNGKey(0), x, lengths)
    out_p = np.asarray(ViTBlock(cfg).apply(params, x, lengths))
    out_f = np.asarray(ViTBlock(cfg_f).apply(params, x, lengths))
    mask = np.arange(24)[None, :, None] < np.asarray(lengths)[:, None, None]
    np.testing.assert_allclose(out_f * mask, out_p * mask, rtol=2e-5,
                               atol=2e-5)


def test_vit_block_flat_int8_cosine():
    """flat + int8: the transpose-free int8 path stays >0.995 cosine to the
    bf16 packed block."""
    import dataclasses
    from visrag_tpu.models.siglip_vit import SiglipViTConfig, ViTBlock
    rng = np.random.default_rng(8)
    cfg = SiglipViTConfig.tiny(embed_dim=64, num_heads=4, mlp_dim=128,
                               dtype=jnp.float32)
    cfg_q = dataclasses.replace(cfg, attn_impl="flat", quant="int8")
    x = jnp.asarray(rng.normal(size=(2, 24, 64)) * 0.3, jnp.float32)
    lengths = jnp.asarray([24, 17], jnp.int32)
    params = ViTBlock(cfg).init(jax.random.PRNGKey(0), x, lengths)
    out_b = np.asarray(ViTBlock(cfg).apply(params, x, lengths))
    out_q = np.asarray(ViTBlock(cfg_q).apply(params, x, lengths))
    a, b = out_b[0].ravel(), out_q[0].ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.995, cos


def test_minicpm_int8_hidden_cosine():
    """Tiny MiniCPM LM: int8 vs fp32 last-hidden cosine > 0.99."""
    import dataclasses
    from visrag_tpu.models.minicpm import MiniCPMConfig, MiniCPMModel
    rng = np.random.default_rng(5)
    cfg = MiniCPMConfig.tiny(hidden_size=96, intermediate_size=192,
                             num_attention_heads=4, num_key_value_heads=4,
                             num_hidden_layers=3)
    ids = jnp.asarray(rng.integers(1, 255, size=(2, 24)), jnp.int32)
    mask = np.ones((2, 24), np.int32)
    mask[1, 18:] = 0
    mask = jnp.asarray(mask)
    m_b = MiniCPMModel(cfg)
    m_q = MiniCPMModel(dataclasses.replace(cfg, quant="int8"))
    params = m_b.init(jax.random.PRNGKey(0), ids, attention_mask=mask)
    out_b = np.asarray(m_b.apply(params, ids, attention_mask=mask))
    out_q = np.asarray(m_q.apply(params, ids, attention_mask=mask))
    a, b = out_b[0, :24].ravel(), out_q[0, :24].ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, cos


def test_vit_tower_int8_embedding_cosine():
    """Whole tiny tower: int8 vs fp32 patch-token cosine > 0.99."""
    from visrag_tpu.models.siglip_vit import SiglipViT, SiglipViTConfig
    rng = np.random.default_rng(4)
    mkcfg = lambda **kw: SiglipViTConfig.tiny(
        embed_dim=64, num_heads=4, mlp_dim=128, depth=3, pos_grid=4,
        patch_size=2, dtype=jnp.float32, **kw)
    n, maxp = 2, 16
    patches = jnp.asarray(rng.normal(size=(n, maxp, 12)), jnp.float32)
    mask = np.zeros((n, maxp), np.int32)
    mask[0, :16] = 1
    mask[1, :12] = 1
    pos = jnp.asarray(rng.normal(size=(n, maxp, 16)) * 0.1, jnp.float32)
    m_b, m_q = SiglipViT(mkcfg()), SiglipViT(mkcfg(quant="int8"))
    params = m_b.init(jax.random.PRNGKey(0), patches, jnp.asarray(mask), pos)
    out_b = np.asarray(m_b.apply(params, patches, jnp.asarray(mask), pos))
    out_q = np.asarray(m_q.apply(params, patches, jnp.asarray(mask), pos))
    v = mask.astype(bool)
    a, b = out_b[v].ravel(), out_q[v].ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, cos
