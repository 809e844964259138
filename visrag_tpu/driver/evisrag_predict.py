"""EVisRAG batch prediction driver.

Parity with /root/reference/src/evisrag/predict.py: reads top-k test jsonl
rows {qid, image: [paths], query}, builds the method prompt
(evidence_prompt_grpo / cocot / ccot / ddcot / baselines), generates with the
TPU serving engine (replacing vLLM, :112-163), appends {qid, imgs, pred}
jsonl.

    python -m visrag_tpu.driver.evisrag_predict --input top3_test.jsonl \
        --checkpoint ckpt_dir --output preds.jsonl --method evidence_prompt_grpo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True,
                    help="HF Qwen2.5-VL checkpoint dir")
    ap.add_argument("--method", default="evidence_prompt_grpo")
    ap.add_argument("--topk", type=int, default=3)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--limit-images", type=int, default=5)
    ap.add_argument("--max-pixels", type=int, default=1568000)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image
    from ..generation.prompts import build_prompt
    from ..models.hf_loader import convert_qwen25_vl, load_safetensors_dir
    from ..models.mrope import get_rope_index
    from ..models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from ..preprocess.qwen_vision import prepare_vision_batch
    from ..serving.engine import Engine
    from ..serving.sampling import SamplingParams

    from .common import get_processor, get_tokenizer
    processor = get_processor(args.checkpoint)
    # text-only checkpoints have no processor (get_processor → None);
    # tokenizers also implement apply_chat_template, so fall back to it
    tok = processor.tokenizer if processor is not None \
        else get_tokenizer(args.checkpoint)
    if processor is None:
        processor = tok
    state = load_safetensors_dir(args.checkpoint)
    params = {"params": convert_qwen25_vl(state)}
    # pick config by hidden size
    from .common import qwen_config_from_checkpoint
    cfg = qwen_config_from_checkpoint(args.checkpoint, state)
    model = Qwen25VL(cfg)
    engine = Engine(model, params, num_slots=4, max_len=16384,
                    prompt_buckets=(4096, 8192, 16384),
                    eos_token_ids=[tok.eos_token_id],
                    # 15k multimodal prompts prefill chunk-at-a-time (the
                    # vision tower runs once; chunks slice the embeds), so
                    # running decodes stall at most one 2048-token chunk;
                    # the prefix cache reuses the shared evidence
                    # instruction's pre-image KV across queries
                    chunked_prefill_tokens=2048, prefix_cache=True)
    # ban the image token in generation (the rollout-side logit_bias of
    # vllm_rollout_spmd.py:42-49, applied here too: an <image> id in the
    # prediction text would corrupt the QA eval's answer extraction)
    from ..serving.sampling import banned_ids_bias
    bias = ()
    image_token = getattr(processor, "image_token", None)
    if image_token is not None:
        bias = banned_ids_bias([tok.convert_tokens_to_ids(image_token)])
    sampling = SamplingParams(temperature=args.temperature,
                              repetition_penalty=1.05,
                              max_tokens=args.max_tokens,
                              logit_bias=bias)

    with open(args.input) as f, open(args.output, "a") as out:
        for line in f:
            row = json.loads(line)
            qid, query = row["qid"], row["query"]
            img_paths = row["image"][:min(args.topk, args.limit_images)]
            images = [Image.open(p).convert("RGB") for p in img_paths]
            vb = prepare_vision_batch(images, head_dim=cfg.vision.head_dim,
                                      max_pixels=args.max_pixels,
                                      device_mode=True)
            prompt = build_prompt(args.method, query)
            # chat-template message with the images first (predict.py:134-145)
            content = [{"type": "image"}] * len(images) + [
                {"type": "text", "text": prompt}]
            text = processor.apply_chat_template(
                [{"role": "user", "content": content}], tokenize=False,
                add_generation_prompt=True)
            # expand image placeholders to per-image token counts
            mu = cfg.vision.spatial_merge_size ** 2
            counts = [t * h * w // mu for (t, h, w) in vb.grid_thw]
            for c in counts:
                text = text.replace("<|image_pad|>",
                                    "<|graft_img|>" * c, 1)
            text = text.replace("<|graft_img|>", "<|image_pad|>")
            ids = np.asarray(tok.encode(text), np.int32)
            pos = get_rope_index(ids, vb.grid_thw, cfg.image_token_id)
            slot = np.full(ids.shape, -1, np.int32)
            slot[ids == cfg.image_token_id] = np.arange(vb.n_tokens)
            vision_batch = {k: jnp.asarray(getattr(vb, k)) for k in
                            ("patches", "rot_cos", "rot_sin", "seg_window",
                             "seg_full", "reverse_index")}
            outs = engine.generate(
                [dict(input_ids=ids, positions=pos,
                      vision_batch=vision_batch, slot_map=slot)],
                sampling=sampling)
            pred = tok.decode(outs[0], skip_special_tokens=True)
            out.write(json.dumps({"qid": qid, "imgs": img_paths,
                                  "pred": pred}) + "\n")
            out.flush()
            print(f"{qid}: {pred[:80]!r}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
