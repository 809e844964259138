"""HF export: convert → export roundtrips reproduce the original state_dict."""

import numpy as np
import pytest


def test_qwen_roundtrip():
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.hf_export import export_qwen25_vl
    ref, _ = _hf_tiny()
    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_qwen25_vl(state)
    back = export_qwen25_vl(params)
    # every exported tensor matches the source (modulo the HF prefix form)
    matched = 0
    for k, v in back.items():
        src = state.get(k)
        if src is None:
            src = state.get(k.replace("model.language_model.", "model.")
                            .replace("model.visual.", "visual."))
        assert src is not None, k
        np.testing.assert_array_equal(v, src)
        matched += 1
    assert matched >= len(state) - 2  # rotary buffers are recomputed


def test_minicpm_lm_roundtrip():
    import torch
    from test_models_parity import _to_state
    from visrag_tpu.models.hf_loader import convert_minicpm_lm
    from visrag_tpu.models.hf_export import export_minicpm_lm
    import sys
    sys.path.insert(0, "/root/reference/src")
    from openmatch.modeling.modeling_minicpmv.modeling_minicpm import (
        MiniCPMForCausalLM)
    from openmatch.modeling.modeling_minicpmv.configuration_minicpm import (
        MiniCPMConfig as RefCfg)
    torch.manual_seed(0)
    ref = MiniCPMForCausalLM(RefCfg(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        use_cache=False)).eval()
    state = _to_state(ref)
    back = export_minicpm_lm(convert_minicpm_lm(state))
    for k, v in back.items():
        np.testing.assert_array_equal(v, state[k])
    # all non-buffer weights covered
    missing = set(state) - set(back)
    assert all("inv_freq" in m for m in missing), missing


def test_minicpmv26_roundtrip():
    """params → export_minicpmv26 (HF 2.6 layout) → convert_minicpmv26 →
    identical param tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from visrag_tpu.models.hf_export import export_minicpmv26
    from visrag_tpu.models.hf_loader import convert_minicpmv26
    from visrag_tpu.models.minicpmv26 import (MiniCPMV26Config,
                                              MiniCPMV26ForGeneration)

    cfg = MiniCPMV26Config.tiny()
    model = MiniCPMV26ForGeneration(cfg)
    ids = jnp.asarray(np.arange(8, dtype=np.int32)[None])
    n, p = 2, 16
    vb = {"patches": jnp.zeros((n, p, 12)), "patch_mask":
          jnp.ones((n, p), jnp.int32),
          "pos_matrix": jnp.zeros((n, p, cfg.vit.pos_grid ** 2)),
          "grid_h": jnp.full((n,), 4, jnp.int32),
          "grid_w": jnp.full((n,), 4, jnp.int32)}
    sm = jnp.full((1, 8), -1, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, vision_batch=vb,
                        slot_map=sm)["params"]

    state = export_minicpmv26(params)
    back = convert_minicpmv26(state)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    keys_a = {jax.tree_util.keystr(k) for k, _ in flat_a}
    keys_b = {jax.tree_util.keystr(k) for k, _ in flat_b}
    assert keys_a == keys_b, keys_a ^ keys_b
    b = dict((jax.tree_util.keystr(k), v) for k, v in flat_b)
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v),
                                      b[jax.tree_util.keystr(k)],
                                      err_msg=jax.tree_util.keystr(k))
