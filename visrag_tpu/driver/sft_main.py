"""EVisRAG stage-1 SFT driver.

Parity with /root/reference/evisrag_scripts/full_sft.sh (LLaMA-Factory full
finetune of Qwen2.5-VL-7B: freeze_vision_tower, lr 5e-7, DeepSpeed ZeRO-3):
data rows are chat conversations {prompt/problem, response/answer, images?};
the loss covers response tokens only; the vision tower freezes via a grad
mask; ZeRO-3 becomes FSDP param shardings over the mesh `data` axis.

    python -m visrag_tpu.driver.sft_main --data sft.jsonl \
        --checkpoint <qwen2.5-vl-dir> --output-dir sft_run/ \
        --set lr=5e-7 --set total_steps=2000
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="jsonl rows {prompt|problem, response|answer}")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--max-len", type=int, default=4096)
    ap.add_argument("--set", action="append", default=[],
                    help="SFTConfig overrides, e.g. --set lr=1e-6")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..config import MeshConfig
    from ..data.datasets import batched, iter_rows
    from ..mesh import build_mesh, shard_params_fsdp
    from ..models.hf_loader import convert_qwen25_vl, load_safetensors_dir
    from ..models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from ..training.checkpoint import save_checkpoint
    from ..training.sft import SFTConfig, make_sft_step
    from ..utils.tracker import Tracker

    cfg = SFTConfig()
    # merge_dotlist coerces through config._coerce (bool handles
    # "False"/"0"/"off" correctly — a bare bool("False") would be True)
    from ..config import merge_dotlist
    try:
        cfg = merge_dotlist(cfg, list(args.set))
    except (KeyError, ValueError) as e:
        ap.error(str(e))

    os.makedirs(args.output_dir, exist_ok=True)
    from .common import get_processor, get_tokenizer
    processor = get_processor(args.checkpoint)
    # text-only checkpoints have no processor (get_processor → None);
    # tokenizers also implement apply_chat_template, so fall back to it
    tok = processor.tokenizer if processor is not None \
        else get_tokenizer(args.checkpoint)
    if processor is None:
        processor = tok
    state = load_safetensors_dir(args.checkpoint)
    params = convert_qwen25_vl(state)
    from .common import qwen_config_from_checkpoint
    mcfg = qwen_config_from_checkpoint(args.checkpoint, state)
    model = Qwen25VL(mcfg)

    mesh = build_mesh(MeshConfig()) if len(jax.devices()) > 1 else None
    if mesh is not None:
        params = shard_params_fsdp(params, mesh)

    def encode_row(row):
        prompt = row.get("prompt") or row.get("problem")
        response = row.get("response") or row.get("answer") or ""
        text = processor.apply_chat_template(
            [{"role": "user", "content": [{"type": "text",
                                           "text": prompt}]}],
            tokenize=False, add_generation_prompt=True)
        pids = tok.encode(text)
        rids = tok.encode(response, add_special_tokens=False) + \
            [tok.eos_token_id]
        ids = (pids + rids)[:args.max_len]
        rmask = [0] * len(pids) + [1] * len(rids)
        return np.asarray(ids, np.int32), np.asarray(rmask[:len(ids)],
                                                     np.int32)

    def make_batch(rows):
        pairs = [encode_row(r) for r in rows]
        S = -(-max(len(i) for i, _ in pairs) // 128) * 128
        bs = len(pairs)
        ids = np.zeros((bs, S), np.int32)
        att = np.zeros((bs, S), np.int32)
        rm = np.zeros((bs, S), np.int32)
        for j, (i, m) in enumerate(pairs):
            ids[j, :len(i)] = i
            att[j, :len(i)] = 1
            rm[j, :len(i)] = m
        pos = np.broadcast_to(np.arange(S), (3, bs, S)).astype(np.int32)
        return {"input_ids": jnp.asarray(ids),
                "attention_mask": jnp.asarray(att),
                "response_mask": jnp.asarray(rm),
                "positions": jnp.asarray(pos)}

    tx, step = make_sft_step(model.apply, cfg)
    params = {"params": params}
    opt_state = tx.init(params)
    tracker = Tracker(args.output_dir)
    n = 0
    for rows in batched(iter_rows(args.data), args.batch_size):
        if len(rows) < args.batch_size:
            continue
        params, opt_state, metrics = step(params, opt_state,
                                          make_batch(rows))
        n += 1
        if n % 10 == 0:
            tracker.log({k: float(v) for k, v in metrics.items()}, n)
        if n >= cfg.total_steps:
            break
    save_checkpoint(args.output_dir, n, params)
    tracker.close()
    print(f"done: {n} sft steps -> {args.output_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
