"""JAX params → HF safetensors export (the model-merger role).

Parity with /root/reference/src/rsgrpo/scripts/model_merger.py: the reference
merges per-rank FSDP DTensor shards back into an HF checkpoint; here sharded
arrays are already logically whole under jax.sharding, so export is the
inverse of hf_loader's renames plus a safetensors write.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _flatten(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def export_minicpm_lm(params: dict, *, prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of hf_loader.convert_minicpm_lm."""
    flat = _flatten(params)
    state = {}
    for key, v in flat.items():
        hf = key.replace("layers_", "layers.")
        if hf == "model.embed_tokens.embedding":
            hf = "model.embed_tokens.weight"
        state[prefix + hf] = v
    return state


def export_siglip_vit(params: dict, *, prefix: str = "vpm.") -> Dict[str, np.ndarray]:
    flat = _flatten(params)
    rename = {
        "attn_qkv.weight": "attn.qkv.weight", "attn_qkv.bias": "attn.qkv.bias",
        "attn_proj.weight": "attn.proj.weight", "attn_proj.bias": "attn.proj.bias",
        "mlp_fc1.weight": "mlp.fc1.weight", "mlp_fc1.bias": "mlp.fc1.bias",
        "mlp_fc2.weight": "mlp.fc2.weight", "mlp_fc2.bias": "mlp.fc2.bias",
    }
    state = {}
    for key, v in flat.items():
        if key == "patch_embed_weight":
            state[prefix + "patch_embed.proj.weight"] = v.reshape(
                v.shape[0], 3, 14, 14)
        elif key == "patch_embed_bias":
            state[prefix + "patch_embed.proj.bias"] = v
        elif key == "pos_embed":
            state[prefix + "pos_embed"] = v[None]
        elif key.startswith("blocks_"):
            i, rest = key.split(".", 1)
            i = i[len("blocks_"):]
            state[prefix + f"blocks.{i}.{rename.get(rest, rest)}"] = v
        else:
            state[prefix + key] = v
    return state


def export_resampler(params: dict, *, prefix: str = "resampler.") -> Dict[str, np.ndarray]:
    flat = _flatten(params)
    rename = {
        "in_proj_weight": "attn.in_proj_weight",
        "in_proj_bias": "attn.in_proj_bias",
        "out_proj.weight": "attn.out_proj.weight",
        "out_proj.bias": "attn.out_proj.bias",
    }
    return {prefix + rename.get(k, k): v for k, v in flat.items()}


def export_visrag_ret(params: dict) -> Dict[str, np.ndarray]:
    """VisRAGRet flax params (with 'backbone' root) → MiniCPM-V state_dict.
    The reference _save strips the wrapper prefix the same way
    (dense_trainer.py:67-105)."""
    bb = params["backbone"]
    state = {}
    state.update(export_siglip_vit(bb["vpm"], prefix="vpm."))
    state.update(export_resampler(bb["resampler"], prefix="resampler."))
    state.update(export_minicpm_lm(bb["llm"], prefix="llm."))
    return state


def export_qwen25_vl(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of hf_loader.convert_qwen25_vl (modern HF key layout)."""
    state = {}
    vis = _flatten(params.get("visual", {}))
    rename_v = {
        "attn_qkv.weight": "attn.qkv.weight", "attn_qkv.bias": "attn.qkv.bias",
        "attn_proj.weight": "attn.proj.weight", "attn_proj.bias": "attn.proj.bias",
        "mlp_gate.weight": "mlp.gate_proj.weight", "mlp_gate.bias": "mlp.gate_proj.bias",
        "mlp_up.weight": "mlp.up_proj.weight", "mlp_up.bias": "mlp.up_proj.bias",
        "mlp_down.weight": "mlp.down_proj.weight", "mlp_down.bias": "mlp.down_proj.bias",
    }
    for key, v in vis.items():
        if key == "patch_embed.weight":
            state["model.visual.patch_embed.proj.weight"] = v.reshape(
                v.shape[0], 3, 2, 14, 14)
        elif key.startswith("blocks_"):
            i, rest = key.split(".", 1)
            i = i[len("blocks_"):]
            state[f"model.visual.blocks.{i}.{rename_v.get(rest, rest)}"] = v
        elif key == "merger_ln_q.weight":
            state["model.visual.merger.ln_q.weight"] = v
        elif key.startswith("merger_fc1."):
            state["model.visual.merger.mlp.0." + key.split(".")[-1]] = v
        elif key.startswith("merger_fc2."):
            state["model.visual.merger.mlp.2." + key.split(".")[-1]] = v

    txt = _flatten(params.get("model", {}))
    rename_t = {
        "attn_q": "self_attn.q_proj", "attn_k": "self_attn.k_proj",
        "attn_v": "self_attn.v_proj", "attn_o": "self_attn.o_proj",
        "mlp_gate": "mlp.gate_proj", "mlp_up": "mlp.up_proj",
        "mlp_down": "mlp.down_proj",
    }
    for key, v in txt.items():
        if key == "embed_tokens.embedding":
            state["model.language_model.embed_tokens.weight"] = v
        elif key.startswith("layers_"):
            i, rest = key.split(".", 1)
            i = i[len("layers_"):]
            mod, _, leaf = rest.rpartition(".")
            mod = rename_t.get(mod, mod)
            state[f"model.language_model.layers.{i}.{mod}.{leaf}"] = v
        else:
            state["model.language_model." + key] = v
    if "lm_head" in params:
        state["lm_head.weight"] = np.asarray(params["lm_head"]["weight"])
    return state


def export_siglip_vision_hf(params: dict, *,
                            prefix: str = "vpm.") -> Dict[str, np.ndarray]:
    """Inverse of hf_loader.convert_siglip_vision_hf: SiglipViT params →
    HF SiglipVisionModel key layout (fused attn_qkv split back to q/k/v in
    row order; patch embed unflattened to (D, 3, ps, ps))."""
    flat = _flatten(params)
    state: Dict[str, np.ndarray] = {}
    rename = {"norm1": "layer_norm1", "norm2": "layer_norm2",
              "attn_proj": "self_attn.out_proj",
              "mlp_fc1": "mlp.fc1", "mlp_fc2": "mlp.fc2"}
    for key, v in flat.items():
        if key == "patch_embed_weight":
            d = v.shape[0]
            ps = int(round((v.shape[1] // 3) ** 0.5))
            state[prefix + "embeddings.patch_embedding.weight"] = v.reshape(
                d, 3, ps, ps)
        elif key == "patch_embed_bias":
            state[prefix + "embeddings.patch_embedding.bias"] = v
        elif key == "pos_embed":
            state[prefix + "embeddings.position_embedding.weight"] = v
        elif key.startswith("blocks_"):
            blk, rest = key.split(".", 1)
            i = blk[len("blocks_"):]
            mod, _, leaf = rest.rpartition(".")
            base = prefix + f"encoder.layers.{i}."
            if mod == "attn_qkv":
                q, k, kv = np.split(v, 3, axis=0)
                state[base + f"self_attn.q_proj.{leaf}"] = q
                state[base + f"self_attn.k_proj.{leaf}"] = k
                state[base + f"self_attn.v_proj.{leaf}"] = kv
            elif mod in rename:
                state[base + f"{rename[mod]}.{leaf}"] = v
        elif key.startswith("norm."):
            state[prefix + "post_layernorm." + key.split(".")[-1]] = v
    return state


def export_minicpmv26(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of hf_loader.convert_minicpmv26 (llm.* Qwen2ForCausalLM +
    vpm.* HF SiglipVisionModel + resampler.*) — the model_merger role for
    the 2.6 composite."""
    state: Dict[str, np.ndarray] = {}
    rename_t = {
        "attn_q": "self_attn.q_proj", "attn_k": "self_attn.k_proj",
        "attn_v": "self_attn.v_proj", "attn_o": "self_attn.o_proj",
        "mlp_gate": "mlp.gate_proj", "mlp_up": "mlp.up_proj",
        "mlp_down": "mlp.down_proj",
    }
    for key, v in _flatten(params.get("model", {})).items():
        if key == "embed_tokens.embedding":
            state["llm.model.embed_tokens.weight"] = v
        elif key.startswith("layers_"):
            i, rest = key.split(".", 1)
            i = i[len("layers_"):]
            mod, _, leaf = rest.rpartition(".")
            state[f"llm.model.layers.{i}.{rename_t.get(mod, mod)}.{leaf}"] = v
        else:
            state["llm.model." + key] = v
    if "lm_head" in params:
        state["llm.lm_head.weight"] = np.asarray(params["lm_head"]["weight"])
    state.update(export_siglip_vision_hf(params.get("vpm", {}), prefix="vpm."))
    state.update(export_resampler(params.get("resampler", {}),
                                  prefix="resampler."))
    return state


def save_safetensors(state: Dict[str, np.ndarray], out_dir: str,
                     dtype=None) -> str:
    from safetensors.numpy import save_file
    os.makedirs(out_dir, exist_ok=True)
    if dtype is not None:
        state = {k: v.astype(dtype) for k, v in state.items()}
    path = os.path.join(out_dir, "model.safetensors")
    save_file(dict(state), path)
    return path
