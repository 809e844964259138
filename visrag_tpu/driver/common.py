"""Shared driver plumbing: model/tokenizer/params construction."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.visrag_ret import VisRAGRet, VisRAGRetConfig
from ..preprocess.pipeline import PipelineConfig
from ..preprocess.tokenize import HFTokenizerAdapter, MockTokenizer


def get_tokenizer(model_path: str, override_chat_template: Optional[str] = None,
                  **kwargs):
    """HF tokenizer with the RL-load-bearing corrections the reference applies
    (rsgrpo/verl/utils/tokenizer.py:21-38): optional chat-template override,
    gemma2/3 ambiguous-EOS fix (<end_of_turn>), and pad_token := eos_token
    when the checkpoint ships none (Qwen/Llama) — without it, padded RL
    batches tokenize differently from the reference."""
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(model_path, **kwargs)
    if override_chat_template is not None:
        tok.chat_template = override_chat_template
    if tok.bos_token == "<bos>" and tok.eos_token == "<eos>":
        tok.eos_token = "<end_of_turn>"
    if tok.pad_token_id is None:
        tok.pad_token = tok.eos_token
    return tok


def get_processor(model_path: str, override_chat_template: Optional[str] = None,
                  **kwargs):
    """HF multimodal processor, or None for text-only checkpoints where
    AutoProcessor silently falls back to a bare tokenizer
    (tokenizer.py:41-52) — or raises because the dir ships no
    preprocessor_config.json (converted/test checkpoints)."""
    from transformers import AutoProcessor
    try:
        processor = AutoProcessor.from_pretrained(model_path, **kwargs)
    except (OSError, ValueError):
        if os.path.isdir(model_path) and os.path.exists(
                os.path.join(model_path, "preprocessor_config.json")):
            # a real multimodal checkpoint failed to load — re-raise rather
            # than silently degrading the run to text-only
            raise
        return None
    if override_chat_template is not None:
        processor.chat_template = override_chat_template
    if processor is not None and "Processor" not in type(processor).__name__:
        processor = None
    return processor


def build_tokenizer(checkpoint: str):
    """HF tokenizer from a checkpoint dir if present, else the deterministic
    mock (for smoke runs without downloaded weights)."""
    if checkpoint and os.path.exists(os.path.join(checkpoint, "tokenizer_config.json")):
        return HFTokenizerAdapter(get_tokenizer(checkpoint, use_fast=True))
    return MockTokenizer()


def build_visrag_ret(model_cfg: ModelConfig, *, tiny: bool = False,
                     rng_seed: int = 0) -> Tuple[VisRAGRet, dict, PipelineConfig]:
    """→ (model, params, pipeline_cfg). Loads HF safetensors when
    model_cfg.checkpoint points at a converted MiniCPM-V/VisRAG-Ret dir;
    otherwise random init (bf16)."""
    if tiny:
        cfg = VisRAGRetConfig.tiny()
    else:
        cfg = VisRAGRetConfig(pooling=model_cfg.pooling,
                              normalize=model_cfg.normalize)
    if model_cfg.checkpoint:
        # honor checkpoint config.json rope_scaling (reference
        # modeling_minicpm.py:142-291; configuration_minicpm rope_scaling):
        # a scaled checkpoint loaded without this would silently produce
        # wrong embeddings
        import dataclasses as _dc
        import json as _json
        cfg_json = os.path.join(model_cfg.checkpoint, "config.json")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                hf_cfg = _json.load(f)
            rs = hf_cfg.get("rope_scaling")
            if rs:
                llm = _dc.replace(cfg.backbone.llm,
                                  rope_scaling_type=rs["type"],
                                  rope_scaling_factor=float(rs["factor"]))
                if rs["type"] not in ("linear", "dynamic"):
                    raise ValueError(
                        f"unsupported rope_scaling type {rs['type']!r}")
                cfg = _dc.replace(
                    cfg, backbone=_dc.replace(cfg.backbone, llm=llm))
    model = VisRAGRet(cfg)
    pcfg = PipelineConfig(
        seq_len=64 if tiny else model_cfg.max_inp_length,
        query_num=cfg.backbone.query_num,
        patch_size=cfg.backbone.vit.patch_size,
        src_grid=cfg.backbone.vit.pos_grid,
        scale_resolution=8 if tiny else cfg.backbone.scale_resolution,
        max_patches=64 if tiny else 1152)

    if model_cfg.checkpoint:
        from ..models.hf_loader import convert_visrag_ret, load_safetensors_dir
        state = load_safetensors_dir(model_cfg.checkpoint)
        params = {"params": convert_visrag_ret(state)}
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if np.issubdtype(x.dtype, np.floating) else jnp.asarray(x), params)
    else:
        from ..preprocess.pipeline import build_encode_batch
        from ..models.visrag_ret import EncodeBatch
        from PIL import Image
        rng = np.random.default_rng(0)
        pages = [("init", Image.fromarray(
            rng.integers(0, 255, (12, 12, 3), dtype=np.uint8)))]
        batch = build_encode_batch(MockTokenizer(), pages, pcfg)
        eb = EncodeBatch(**{k: jnp.asarray(v) for k, v in batch.items()})

        @jax.jit
        def init(key):
            p = model.init(key, eb)
            if tiny:
                return p
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, p)

        params = init(jax.random.PRNGKey(rng_seed))
    return model, params, pcfg


def encode_qwen_prompt_row(row, processor, tok, mcfg, rollout_cfg):
    """RL prompt row → engine-ready dict (the reference RLHFDataset role,
    rsgrpo/verl/utils/dataset.py:159-296). Text-only rows tokenize the chat
    template; multimodal rows additionally load/resize images into the
    rollout pixel budget, expand per-image pad tokens, and attach the uint8
    device-mode vision batch + mrope positions + flat slot map."""
    prompt = row.get("problem") or row.get("prompt")
    images = row.get("images") or row.get("image") or []
    if not isinstance(images, (list, tuple)):
        images = [images]
    images = list(images)[:rollout_cfg.limit_images]
    content = [{"type": "image"}] * len(images) + [
        {"type": "text", "text": prompt}]
    text = processor.apply_chat_template(
        [{"role": "user", "content": content}],
        tokenize=False, add_generation_prompt=True)
    if not images:
        ids = np.asarray(tok.encode(text), np.int32)
        return dict(input_ids=ids, ground_truth=row.get("answer", ""))

    from PIL import Image as _Image
    from ..data.datasets import to_pil
    from ..models.mrope import get_rope_index
    from ..preprocess.qwen_vision import prepare_vision_batch
    pil = [(_Image.open(im).convert("RGB") if isinstance(im, str)
            else to_pil(im).convert("RGB")) for im in images]
    vb = prepare_vision_batch(
        pil, head_dim=mcfg.vision.head_dim,
        min_pixels=rollout_cfg.min_pixels,
        max_pixels=rollout_cfg.max_pixels, device_mode=True)
    mu = mcfg.vision.spatial_merge_size ** 2
    for (t, h, w) in vb.grid_thw:       # expand pads per image, in order
        text = text.replace("<|image_pad|>",
                            "<|graft_img|>" * (t * h * w // mu), 1)
    text = text.replace("<|graft_img|>", "<|image_pad|>")
    ids = np.asarray(tok.encode(text), np.int32)
    pos = get_rope_index(ids, vb.grid_thw, mcfg.image_token_id)
    slot = np.full(ids.shape, -1, np.int32)
    slot[ids == mcfg.image_token_id] = np.arange(vb.n_tokens)
    vision_batch = {k: getattr(vb, k) for k in
                    ("patches", "rot_cos", "rot_sin", "seg_window",
                     "seg_full", "reverse_index")}
    return dict(input_ids=ids, positions=pos, vision_batch=vision_batch,
                slot_map=slot, ground_truth=row.get("answer", ""))


def qwen_config_from_checkpoint(checkpoint: str, state=None):
    """Model config for a Qwen2.5-VL checkpoint dir: read config.json
    (Qwen25VLConfig.from_hf — serves any geometry incl. tiny test
    checkpoints); fall back to the preset table keyed by embedding width
    when the json is absent (converted dirs that ship only safetensors)."""
    import json as _json
    import os as _os

    import numpy as _np

    from ..models.qwen25_vl import Qwen25VLConfig
    cfg_json = _os.path.join(checkpoint, "config.json")
    if _os.path.exists(cfg_json):
        with open(cfg_json) as f:
            return Qwen25VLConfig.from_hf(_json.load(f))
    hid = state[[k for k in state if "embed_tokens" in k][0]].shape[1]
    return {3584: Qwen25VLConfig.b7, 5120: Qwen25VLConfig.b32,
            8192: Qwen25VLConfig.b72}.get(hid, Qwen25VLConfig.b3)()
