"""HF-checkpoint ↔ JAX param-pytree conversion for the model zoo.

Maps MiniCPM-V 2.0 / VisRAG-Ret safetensors layouts (torch state_dict names,
see /root/reference/src/openmatch/modeling/modeling_minicpmv/) onto the flax
module trees defined in this package. Linear kernels keep the torch (out, in)
orientation (models/common.py Dense), so conversion is pure renaming plus a
few reshapes (conv patch-embed flatten, pos-embed squeeze).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Mapping, Optional

import numpy as np


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


# --- per-tower converters ---------------------------------------------------


def convert_minicpm_lm(state: Mapping[str, "np.ndarray"], *,
                       prefix: str = "", lm_head: bool = True) -> dict:
    """torch MiniCPMForCausalLM state_dict → flax params dict for
    MiniCPMForCausalLM/MiniCPMModel. `prefix` strips e.g. 'llm.'."""
    params: dict = {}
    for name, t in state.items():
        if prefix:
            if not name.startswith(prefix):
                continue
            name = name[len(prefix):]
        v = _np(t)
        m = re.match(r"model\.layers\.(\d+)\.(.+)", name)
        if m:
            i, rest = m.group(1), m.group(2)
            _set(params, f"model.layers_{i}.{rest}", v)
        elif name == "model.embed_tokens.weight":
            _set(params, "model.embed_tokens.embedding", v)
        elif name == "model.norm.weight":
            _set(params, "model.norm.weight", v)
        elif name == "lm_head.weight" and lm_head:
            _set(params, "lm_head.weight", v)
        # rotary inv_freq buffers etc. are recomputed
    return params


def convert_siglip_vit(state: Mapping[str, "np.ndarray"], *,
                       prefix: str = "vpm.", depth: int = 26) -> dict:
    """timm VisionTransformer state_dict → flax params for SiglipViT.
    Keeps only the first `depth` blocks (drop_vision_last_layer)."""
    params: dict = {}
    for name, t in state.items():
        if prefix:
            if not name.startswith(prefix):
                continue
            name = name[len(prefix):]
        v = _np(t)
        if name == "patch_embed.proj.weight":      # (D, 3, ps, ps)
            _set(params, "patch_embed_weight", v.reshape(v.shape[0], -1))
        elif name == "patch_embed.proj.bias":
            _set(params, "patch_embed_bias", v)
        elif name == "pos_embed":                   # (1, 729, D) or (729, D)
            _set(params, "pos_embed", v.reshape(-1, v.shape[-1]))
        elif (m := re.match(r"blocks\.(\d+)\.(.+)", name)):
            i = int(m.group(1))
            if i >= depth:
                continue
            rest = m.group(2)
            rename = {
                "norm1.weight": "norm1.weight", "norm1.bias": "norm1.bias",
                "norm2.weight": "norm2.weight", "norm2.bias": "norm2.bias",
                "attn.qkv.weight": "attn_qkv.weight",
                "attn.qkv.bias": "attn_qkv.bias",
                "attn.proj.weight": "attn_proj.weight",
                "attn.proj.bias": "attn_proj.bias",
                "mlp.fc1.weight": "mlp_fc1.weight",
                "mlp.fc1.bias": "mlp_fc1.bias",
                "mlp.fc2.weight": "mlp_fc2.weight",
                "mlp.fc2.bias": "mlp_fc2.bias",
            }
            if rest in rename:
                _set(params, f"blocks_{i}.{rename[rest]}", v)
        elif name == "norm.weight":
            _set(params, "norm.weight", v)
        elif name == "norm.bias":
            _set(params, "norm.bias", v)
    return params


def convert_resampler(state: Mapping[str, "np.ndarray"], *,
                      prefix: str = "resampler.") -> dict:
    params: dict = {}
    rename = {
        "query": "query",
        "pos_embed": "pos_embed",
        "kv_proj.weight": "kv_proj.weight",
        "attn.in_proj_weight": "in_proj_weight",
        "attn.in_proj_bias": "in_proj_bias",
        "attn.out_proj.weight": "out_proj.weight",
        "attn.out_proj.bias": "out_proj.bias",
        "ln_q.weight": "ln_q.weight", "ln_q.bias": "ln_q.bias",
        "ln_kv.weight": "ln_kv.weight", "ln_kv.bias": "ln_kv.bias",
        "ln_post.weight": "ln_post.weight", "ln_post.bias": "ln_post.bias",
        "proj": "proj",
    }
    for name, t in state.items():
        if prefix:
            if not name.startswith(prefix):
                continue
            name = name[len(prefix):]
        if name in rename:
            _set(params, rename[name], _np(t))
    return params


def convert_minicpmv(state: Mapping[str, "np.ndarray"], *,
                     vit_depth: int = 26) -> dict:
    """Full MiniCPM-V 2.0 state_dict → flax params for models.minicpmv.MiniCPMV
    (llm hidden states only; lm_head dropped as in VisRAG-Ret).

    The flax MiniCPMV.llm is a MiniCPMModel directly (no CausalLM wrapper),
    so the torch 'llm.model.*' subtree maps to the 'llm' scope without the
    intermediate 'model' level — verified end-to-end by
    tests/test_composite_golden.py against the reference composite."""
    lm = convert_minicpm_lm(state, prefix="llm.", lm_head=False)
    return {
        "vpm": convert_siglip_vit(state, prefix="vpm.", depth=vit_depth),
        "resampler": convert_resampler(state, prefix="resampler."),
        "llm": lm["model"],
    }


def convert_visrag_ret(state: Mapping[str, "np.ndarray"], **kw) -> dict:
    return {"backbone": convert_minicpmv(state, **kw)}


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors in an HF checkpoint dir into one flat dict."""
    import glob
    import os

    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors under {path}")
    for f in files:
        with safe_open(f, framework="np") as sf:
            for k in sf.keys():
                state[k] = sf.get_tensor(k)
    return state


# --- Qwen2.5-VL ------------------------------------------------------------


def convert_qwen25_vl(state: Mapping[str, "np.ndarray"]) -> dict:
    """HF Qwen2_5_VLForConditionalGeneration state_dict → flax params for
    models.qwen25_vl.Qwen25VL. Handles both HF key layouts ('model.layers.*'
    pre-4.52 and 'model.language_model.layers.*' after)."""
    params: dict = {}
    for name, t in state.items():
        v = _np(t)
        # normalize prefixes
        name = name.replace("model.language_model.", "model.")
        name = name.replace("model.visual.", "visual.")
        if name.startswith("visual."):
            rest = name[len("visual."):]
            if rest == "patch_embed.proj.weight":
                _set(params, "visual.patch_embed.weight",
                     v.reshape(v.shape[0], -1))
            elif (m := re.match(r"blocks\.(\d+)\.(.+)", rest)):
                i, sub = m.group(1), m.group(2)
                rename = {
                    "norm1.weight": "norm1.weight",
                    "norm2.weight": "norm2.weight",
                    "attn.qkv.weight": "attn_qkv.weight",
                    "attn.qkv.bias": "attn_qkv.bias",
                    "attn.proj.weight": "attn_proj.weight",
                    "attn.proj.bias": "attn_proj.bias",
                    "mlp.gate_proj.weight": "mlp_gate.weight",
                    "mlp.gate_proj.bias": "mlp_gate.bias",
                    "mlp.up_proj.weight": "mlp_up.weight",
                    "mlp.up_proj.bias": "mlp_up.bias",
                    "mlp.down_proj.weight": "mlp_down.weight",
                    "mlp.down_proj.bias": "mlp_down.bias",
                }
                if sub in rename:
                    _set(params, f"visual.blocks_{i}.{rename[sub]}", v)
            elif rest == "merger.ln_q.weight":
                _set(params, "visual.merger_ln_q.weight", v)
            elif rest == "merger.mlp.0.weight":
                _set(params, "visual.merger_fc1.weight", v)
            elif rest == "merger.mlp.0.bias":
                _set(params, "visual.merger_fc1.bias", v)
            elif rest == "merger.mlp.2.weight":
                _set(params, "visual.merger_fc2.weight", v)
            elif rest == "merger.mlp.2.bias":
                _set(params, "visual.merger_fc2.bias", v)
        else:
            _qwen_text_set(params, name, v)
    return params


def convert_siglip_vision_hf(state: Mapping[str, "np.ndarray"], *,
                             prefix: str = "vpm.") -> dict:
    """HF SiglipVisionModel/SiglipVisionTransformer state_dict → flax params
    for models.siglip_vit.SiglipViT (the static-patchified tower). The
    MiniCPM-V 2.6 checkpoint stores its vision tower in this layout (vs the
    2.0 checkpoint's timm layout — convert_siglip_vit). HF keeps separate
    q/k/v projections; SiglipViT uses the fused attn_qkv — concatenated
    here in (q, k, v) row order."""
    tmp: Dict[str, Dict[str, np.ndarray]] = {}
    params: dict = {}
    for name, t in state.items():
        if prefix:
            if not name.startswith(prefix):
                continue
            name = name[len(prefix):]
        v = _np(t)
        # tolerate an extra "vision_model." nesting (SiglipVisionModel)
        if name.startswith("vision_model."):
            name = name[len("vision_model."):]
        if name == "embeddings.patch_embedding.weight":
            _set(params, "patch_embed_weight", v.reshape(v.shape[0], -1))
        elif name == "embeddings.patch_embedding.bias":
            _set(params, "patch_embed_bias", v)
        elif name == "embeddings.position_embedding.weight":
            _set(params, "pos_embed", v)
        elif (m := re.match(
                r"encoder\.layers\.(\d+)\.(.+?)\.(weight|bias)", name)):
            i, mod, leaf = m.groups()
            rename = {"layer_norm1": "norm1", "layer_norm2": "norm2",
                      "self_attn.out_proj": "attn_proj",
                      "mlp.fc1": "mlp_fc1", "mlp.fc2": "mlp_fc2"}
            if mod in rename:
                _set(params, f"blocks_{i}.{rename[mod]}.{leaf}", v)
            elif mod in ("self_attn.q_proj", "self_attn.k_proj",
                         "self_attn.v_proj"):
                tmp.setdefault(f"blocks_{i}.{leaf}", {})[mod[10]] = v
        elif name.startswith("post_layernorm."):
            _set(params, "norm." + name.split(".")[-1], v)
    for path, qkv in tmp.items():
        blk, leaf = path.rsplit(".", 1)
        _set(params, f"{blk}.attn_qkv.{leaf}",
             np.concatenate([qkv["q"], qkv["k"], qkv["v"]], axis=0))
    return params


def _qwen_text_set(params: dict, name: str, v: "np.ndarray") -> None:
    """One HF Qwen2/Qwen2.5 text-stack entry → flax param path (shared by
    convert_qwen25_vl and convert_minicpmv26)."""
    if (m := re.match(r"model\.layers\.(\d+)\.(.+)", name)):
        i, sub = m.group(1), m.group(2)
        rename = {
            "self_attn.q_proj": "attn_q", "self_attn.k_proj": "attn_k",
            "self_attn.v_proj": "attn_v", "self_attn.o_proj": "attn_o",
            "mlp.gate_proj": "mlp_gate", "mlp.up_proj": "mlp_up",
            "mlp.down_proj": "mlp_down",
            "input_layernorm": "input_layernorm",
            "post_attention_layernorm": "post_attention_layernorm",
        }
        mod, _, leaf = sub.rpartition(".")
        if mod in rename:
            _set(params, f"model.layers_{i}.{rename[mod]}.{leaf}", v)
    elif name == "model.embed_tokens.weight":
        _set(params, "model.embed_tokens.embedding", v)
    elif name == "model.norm.weight":
        _set(params, "model.norm.weight", v)
    elif name == "lm_head.weight":
        _set(params, "lm_head.weight", v)


def convert_minicpmv26(state: Mapping[str, "np.ndarray"]) -> dict:
    """openbmb/MiniCPM-V-2_6 state_dict → flax params for
    models.minicpmv26.MiniCPMV26ForGeneration. Checkpoint layout: 'llm.*'
    Qwen2ForCausalLM, 'vpm.*' HF SiglipVisionModel, 'resampler.*'."""
    params: dict = {}
    for name, t in state.items():
        if name.startswith("llm."):
            _qwen_text_set(params, name[len("llm."):], _np(t))
    vpm = convert_siglip_vision_hf(state, prefix="vpm.")
    if vpm:
        params["vpm"] = vpm
    res = convert_resampler(state, prefix="resampler.")
    if res:
        params["resampler"] = res
    return params


# --- SigLIP -----------------------------------------------------------------


def convert_siglip(state: Mapping[str, "np.ndarray"]) -> dict:
    """HF SiglipModel state_dict → flax params for models.siglip.SiglipModel."""
    params: dict = {}
    layer_renames = {
        "self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
        "self_attn.v_proj": "v_proj", "self_attn.out_proj": "out_proj",
        "layer_norm1": "layer_norm1", "layer_norm2": "layer_norm2",
        "mlp.fc1": "fc1", "mlp.fc2": "fc2",
    }
    for name, t in state.items():
        v = _np(t)
        if name == "logit_scale":
            _set(params, "logit_scale", v.reshape(()))
        elif name == "logit_bias":
            _set(params, "logit_bias", v.reshape(()))
        elif name.startswith("text_model."):
            rest = name[len("text_model."):]
            if rest == "embeddings.token_embedding.weight":
                _set(params, "text_model.token_embedding.embedding", v)
            elif rest == "embeddings.position_embedding.weight":
                _set(params, "text_model.position_embedding", v)
            elif (m := re.match(r"encoder\.layers\.(\d+)\.(.+?)\.(weight|bias)", rest)):
                i, mod, leaf = m.groups()
                if mod in layer_renames:
                    _set(params, f"text_model.layers_{i}.{layer_renames[mod]}.{leaf}", v)
            elif rest.startswith("final_layer_norm."):
                _set(params, "text_model.final_layer_norm." + rest.split(".")[-1], v)
            elif rest.startswith("head."):
                _set(params, "text_model.head." + rest.split(".")[-1], v)
        elif name.startswith("vision_model."):
            rest = name[len("vision_model."):]
            if rest == "embeddings.patch_embedding.weight":
                _set(params, "vision_model.patch_embedding",
                     v.reshape(v.shape[0], -1))
            elif rest == "embeddings.patch_embedding.bias":
                _set(params, "vision_model.patch_bias", v)
            elif rest == "embeddings.position_embedding.weight":
                _set(params, "vision_model.position_embedding", v)
            elif (m := re.match(r"encoder\.layers\.(\d+)\.(.+?)\.(weight|bias)", rest)):
                i, mod, leaf = m.groups()
                if mod in layer_renames:
                    _set(params, f"vision_model.layers_{i}.{layer_renames[mod]}.{leaf}", v)
            elif rest.startswith("post_layernorm."):
                _set(params, "vision_model.post_layernorm." + rest.split(".")[-1], v)
            elif rest == "head.probe":
                _set(params, "vision_model.probe", v)
            elif rest == "head.attention.in_proj_weight":
                _set(params, "vision_model.in_proj_weight", v)
            elif rest == "head.attention.in_proj_bias":
                _set(params, "vision_model.in_proj_bias", v)
            elif rest == "head.attention.out_proj.weight":
                _set(params, "vision_model.attn_out_proj.weight", v)
            elif rest == "head.attention.out_proj.bias":
                _set(params, "vision_model.attn_out_proj.bias", v)
            elif rest == "head.layernorm.weight":
                _set(params, "vision_model.map_layernorm.weight", v)
            elif rest == "head.layernorm.bias":
                _set(params, "vision_model.map_layernorm.bias", v)
            elif rest == "head.mlp.fc1.weight":
                _set(params, "vision_model.map_fc1.weight", v)
            elif rest == "head.mlp.fc1.bias":
                _set(params, "vision_model.map_fc1.bias", v)
            elif rest == "head.mlp.fc2.weight":
                _set(params, "vision_model.map_fc2.weight", v)
            elif rest == "head.mlp.fc2.bias":
                _set(params, "vision_model.map_fc2.bias", v)
    return params
