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
