"""Interactive RAG demo: build_index + answer.

Parity with /root/reference/visrag_scripts/demo/visrag_pipeline/
build_index.py (:32-58 PDF → pixmap → encode → reps.npy +
index2img_filename.txt) and answer.py (:14-54 query encode → q@repsᵀ → topk
→ VLM answer over topk page images).

    python -m visrag_tpu.driver.demo build-index --input docs/ --output idx/
    python -m visrag_tpu.driver.demo answer --index idx/ --query "..." [--topk 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _encoder(args):
    from ..config import ModelConfig
    from ..models.visrag_ret import EncodeBatch
    from ..preprocess.pipeline import build_encode_batch
    from .common import build_tokenizer, build_visrag_ret

    mcfg = ModelConfig(checkpoint=args.checkpoint)
    model, params, pcfg = build_visrag_ret(mcfg, tiny=args.tiny)
    tok = build_tokenizer(args.checkpoint)
    apply = jax.jit(model.apply)

    def encode(items):
        slots = max(1, len(items)) * pcfg.max_slices_per_page
        arrs = build_encode_batch(tok, items, pcfg, n_slice_slots=slots)
        eb = EncodeBatch(**{k: jnp.asarray(v) for k, v in arrs.items()})
        return np.asarray(apply(params, eb), np.float32)

    return encode


def build_index(args):
    from ..preprocess.rasterize import file_to_images

    encode = _encoder(args)
    os.makedirs(args.output, exist_ok=True)
    img_dir = os.path.join(args.output, "pages")
    os.makedirs(img_dir, exist_ok=True)

    names, reps = [], []
    inputs = ([os.path.join(args.input, f) for f in sorted(os.listdir(args.input))]
              if os.path.isdir(args.input) else [args.input])
    for path in inputs:
        for pi, img in enumerate(file_to_images(path, dpi=args.dpi)):
            name = f"{os.path.basename(path)}.page{pi}.png"
            img.save(os.path.join(img_dir, name))
            reps.append(encode([("", img)])[0])
            names.append(name)
            print(f"indexed {name}", file=sys.stderr)
    np.save(os.path.join(args.output, "reps.npy"),
            np.stack(reps) if reps else np.zeros((0, 1), np.float32))
    with open(os.path.join(args.output, "index2img_filename.txt"), "w") as f:
        f.write("\n".join(names))
    print(f"index: {len(names)} pages -> {args.output}", file=sys.stderr)
    return 0


def answer(args):
    encode = _encoder(args)
    reps = np.load(os.path.join(args.index, "reps.npy"))
    with open(os.path.join(args.index, "index2img_filename.txt")) as f:
        names = f.read().splitlines()

    instruction = "Represent this query for retrieving relevant documents: "
    q = encode([(instruction + args.query, None)])[0]
    scores = reps @ q
    top = np.argsort(-scores)[:args.topk]
    result = {"query": args.query,
              "retrieved": [{"page": names[i], "score": float(scores[i])}
                            for i in top]}
    if getattr(args, "gen_checkpoint", None):
        # answer over the top-k page images with MiniCPM-V 2.6 — the
        # reference demo's generator (answer.py:14-54 chats MiniCPM-V-2.6
        # over topk images). Gated on a local checkpoint dir.
        from PIL import Image
        from .generate_eval import _minicpmv26_backend
        gen = _minicpmv26_backend(args.gen_checkpoint, args.max_new_tokens, 9)
        # build_index saves pages under <index>/pages/<name>
        pages = [Image.open(names[i] if os.path.isabs(names[i]) else
                            os.path.join(args.index, "pages", names[i]))
                 .convert("RGB") for i in top]
        text, _ = gen(args.query, pages)
        result["answer"] = text
    print(json.dumps(result, indent=1))
    out = os.path.join(args.index, "answer.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build-index")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--dpi", type=int, default=200)
    b.add_argument("--checkpoint", default="")
    b.add_argument("--tiny", action="store_true")
    a = sub.add_parser("answer")
    a.add_argument("--index", required=True)
    a.add_argument("--query", required=True)
    a.add_argument("--topk", type=int, default=3)
    a.add_argument("--checkpoint", default="")
    a.add_argument("--gen-checkpoint", default="",
                   help="MiniCPM-V 2.6 dir: answer over top-k page images "
                        "(reference answer.py); retrieval-only if empty")
    a.add_argument("--max-new-tokens", type=int, default=256)
    a.add_argument("--tiny", action="store_true")
    args = ap.parse_args(argv)
    return build_index(args) if args.cmd == "build-index" else answer(args)


if __name__ == "__main__":
    sys.exit(main())
