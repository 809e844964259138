"""Pseudo query–answer synthesis from page images.

The data-synthesis role of /root/reference/visrag_scripts/data/batch_api.py
(GPT-4o, threadpool of 32, ≤6 q-a pairs per page, JSON output) — but
TPU-native: the generator is a local VLM on the serving engine. An
OpenAI-compatible HTTP endpoint can be used instead with --api-base (gated;
this image has no egress).

    python tools/synthesize_queries.py --pages pages_dir/ \
        --checkpoint <qwen2.5-vl-dir> --output pairs.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

SYNTH_PROMPT = (
    "You are given an image of a document page. Write up to 6 question-answer "
    "pairs that can be answered from this page alone. Questions must be "
    "specific and self-contained; answers short and factual. Output strict "
    "JSON: [{\"question\": ..., \"answer\": ...}, ...] and nothing else.")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="dir of page images")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="local Qwen2.5-VL checkpoint (TPU generator)")
    ap.add_argument("--api-base", default=None,
                    help="OpenAI-compatible endpoint (needs network)")
    ap.add_argument("--model", default="gpt-4o")
    ap.add_argument("--max-tokens", type=int, default=1024)
    args = ap.parse_args(argv)

    from PIL import Image

    paths = [os.path.join(args.pages, f) for f in sorted(os.listdir(args.pages))
             if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))]

    if args.api_base:
        generate = _make_api_generator(args)
    elif args.checkpoint:
        generate = _make_local_generator(args)
    else:
        ap.error("need --checkpoint (local VLM) or --api-base")

    with open(args.output, "a") as out:
        for path in paths:
            img = Image.open(path).convert("RGB")
            text = generate(img)
            try:
                pairs = json.loads(text[text.find("["):text.rfind("]") + 1])
            except (ValueError, json.JSONDecodeError):
                print(f"unparseable output for {path}", file=sys.stderr)
                continue
            for p in pairs:
                if "question" in p and "answer" in p:
                    out.write(json.dumps({"page": os.path.basename(path),
                                          "query": p["question"],
                                          "answer": p["answer"]}) + "\n")
            out.flush()
            print(f"synthesized {len(pairs)} pairs for {path}",
                  file=sys.stderr)
    return 0


def _make_local_generator(args):
    import jax.numpy as jnp
    import numpy as np
    from transformers import AutoProcessor

    from visrag_tpu.models.hf_loader import (convert_qwen25_vl,
                                             load_safetensors_dir)
    from visrag_tpu.models.mrope import get_rope_index
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.preprocess.qwen_vision import prepare_vision_batch
    from visrag_tpu.serving.engine import Engine
    from visrag_tpu.serving.sampling import SamplingParams

    processor = AutoProcessor.from_pretrained(args.checkpoint)
    tok = processor.tokenizer
    state = load_safetensors_dir(args.checkpoint)
    hid = state[[k for k in state if "embed_tokens" in k][0]].shape[1]
    cfg = Qwen25VLConfig.b7() if hid == 3584 else Qwen25VLConfig.b3()
    model = Qwen25VL(cfg)
    params = {"params": convert_qwen25_vl(state)}
    engine = Engine(model, params, num_slots=4, max_len=8192,
                    prompt_buckets=(2048, 4096, 8192),
                    eos_token_ids=[tok.eos_token_id])

    def generate(img):
        vb = prepare_vision_batch([img], head_dim=cfg.vision.head_dim)
        text = processor.apply_chat_template(
            [{"role": "user", "content": [{"type": "image"},
                                          {"type": "text",
                                           "text": SYNTH_PROMPT}]}],
            tokenize=False, add_generation_prompt=True)
        mu = cfg.vision.spatial_merge_size ** 2
        count = sum(t * h * w // mu for (t, h, w) in vb.grid_thw)
        text = text.replace("<|image_pad|>", "<|image_pad|>" * count, 1)
        ids = np.asarray(tok.encode(text), np.int32)
        pos = get_rope_index(ids, vb.grid_thw, cfg.image_token_id)
        slot = np.full(ids.shape, -1, np.int32)
        slot[ids == cfg.image_token_id] = np.arange(vb.n_tokens)
        vision_batch = {k: jnp.asarray(getattr(vb, k)) for k in
                        ("patches", "rot_cos", "rot_sin", "seg_window",
                         "seg_full", "reverse_index")}
        outs = engine.generate(
            [dict(input_ids=ids, positions=pos, vision_batch=vision_batch,
                  slot_map=slot)],
            sampling=SamplingParams(temperature=0.2,
                                    max_tokens=args.max_tokens))
        return tok.decode(outs[0], skip_special_tokens=True)

    return generate


def _make_api_generator(args):
    import base64
    import io
    import urllib.request

    def generate(img):
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        payload = json.dumps({
            "model": args.model,
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": SYNTH_PROMPT},
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{b64}"}}]}],
            "max_tokens": args.max_tokens,
        }).encode()
        req = urllib.request.Request(
            args.api_base.rstrip("/") + "/chat/completions", data=payload,
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer " +
                     os.environ.get("OPENAI_API_KEY", "")})
        with urllib.request.urlopen(req, timeout=120) as r:
            data = json.load(r)
        return data["choices"][0]["message"]["content"]

    return generate


if __name__ == "__main__":
    sys.exit(main())
