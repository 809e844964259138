"""VisRAG-Gen evaluation driver: generation over retrieved pages, scored
with the reference's per-dataset protocol.

Parity with /root/reference/visrag_scripts/generate/generate.py: task types
text / page_concatenation / weighted_selection / multi_image (:40), top-k
pages from TREC runs or oracle positives (:270-298), per-dataset prompts
(:301-418), per-dataset answer checking (:496-586), MiniCPM-V backend on the
TPU serving engine (replacing the cuda `.chat` path :240-267) and a gated
GPT-4o backend (:353-383).

    python -m visrag_tpu.driver.generate_eval --dataset-name ChartQA \
        --queries queries.jsonl --corpus-dir pages/ --trec runs/ChartQA \
        --task-type multi_image --topk 3 --checkpoint minicpmv_dir \
        --output-dir out/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Callable, Dict, List, Optional, Sequence, Tuple


def run_generate_eval(dataset: str, examples: Sequence[dict],
                      generate_fn: Callable, *, task_type: str, topk: int = 3,
                      run: Optional[Dict[str, Dict[str, float]]] = None,
                      use_positive_sample: bool = False,
                      corpus: Optional[dict] = None,
                      table_dir: Optional[str] = None
                      ) -> Tuple[float, List[dict]]:
    """The protocol core, backend-agnostic (testable without a model).

    examples: [{qid, query, answer, options?}]; corpus: docid → PIL image
    (image tasks) or text (text task); generate_fn(prompt, images) →
    (text, seq_logprob). Returns (accuracy, per-query records)."""
    from ..generation.gen_eval import (build_image_prompt, build_text_prompt,
                                       check_response, get_flatten_table,
                                       oracle_docids, topk_docids)
    from ..generation.strategies import generate_with_strategy

    n_correct = 0
    records: List[dict] = []
    for ex in examples:
        qid, query, answer = ex["qid"], ex["query"], ex["answer"]
        if use_positive_sample:
            docids = oracle_docids(qid, dataset)
            scores = [1.0 / len(docids)] * len(docids)
        else:
            docids, scores = topk_docids(run[qid], topk)
        if task_type == "text":
            if dataset == "ChartQA":
                if table_dir is None:
                    raise ValueError("ChartQA text task needs --table-dir "
                                     "(generate.py:302-305)")
                docs = [get_flatten_table(os.path.join(
                    table_dir, d.split(".")[0] + ".csv")) for d in docids]
            else:
                docs = [corpus[d] for d in docids]
            prompt = build_text_prompt(dataset, query, docs, ex)
            pred, _ = generate_fn(prompt, [])
        else:
            pages = [corpus[d] for d in docids]
            pred = generate_with_strategy(
                task_type, query, pages, scores, generate_fn,
                lambda q, n: build_image_prompt(dataset, q, ex),
                # beam-scored weighted selection when the backend offers it
                # (reference num_beams=3 sequences_scores)
                score_fn=getattr(generate_fn, "score_fn", None))
        pred = pred if pred is not None else ""
        correct, npred, nans = check_response(dataset, pred, answer)
        n_correct += correct
        records.append({"qid": qid, "pred": npred, "answer": nans,
                        "correct": correct})
    return n_correct / max(len(examples), 1), records


def _minicpmv_backend(checkpoint: str, max_new_tokens: int,
                      max_slice_nums: int):
    """MiniCPM-V 2.0 on the TPU serving engine. generate_fn(prompt, images)
    → (text, cum_logprob)."""
    import jax.numpy as jnp
    import numpy as np
    from ..models.hf_loader import convert_minicpmv, load_safetensors_dir
    from ..models.minicpmv import MiniCPMVForGeneration, MiniCPMVGenConfig
    from ..preprocess.pipeline import PipelineConfig, build_encode_batch
    from ..serving.engine import Engine
    from ..serving.sampling import SamplingParams

    from .common import get_tokenizer
    tok = get_tokenizer(checkpoint, trust_remote_code=True)
    params = {"params": convert_minicpmv(load_safetensors_dir(checkpoint))}
    cfg = MiniCPMVGenConfig()
    model = MiniCPMVForGeneration(cfg)
    engine = Engine(model, params, num_slots=4, max_len=4096,
                    prompt_buckets=(1024, 2048, 4096),
                    eos_token_ids=[tok.eos_token_id])
    pcfg = PipelineConfig(
        seq_len=2048, query_num=cfg.backbone.query_num,
        patch_size=cfg.backbone.vit.patch_size,
        src_grid=cfg.backbone.vit.pos_grid,
        scale_resolution=cfg.backbone.scale_resolution, max_patches=1152)
    sampling = SamplingParams(temperature=0.0, max_tokens=max_new_tokens)

    def generate_fn(prompt, images):
        # MiniCPM-V 2.0 is single-image (the reference runs multi_image with
        # MiniCPM-V 2.6 / GPT-4o; page_concatenation folds pages first)
        assert len(images) <= 1, "minicpmv backend takes at most one image"
        arrs = build_encode_batch(tok, [(prompt, images[0] if images else
                                         None)], pcfg)
        s = int(arrs["attention_mask"][0].sum())
        vb = {k: jnp.asarray(arrs[k]) for k in
              ("patches", "patch_mask", "pos_matrix", "grid_h", "grid_w")} \
            if images else None
        req = engine.generate_detailed(
            [dict(input_ids=arrs["input_ids"][0, :s],
                  vision_batch=vb,
                  slot_map=arrs["slot_map"][0, :s] if images else None)],
            sampling=sampling)[0]
        return tok.decode(req.output_ids, skip_special_tokens=True), \
            req.cum_logprob

    def score_fn(prompt, images):
        """Beam-scored answer for weighted_selection (reference
        sampling=False config: num_beams=3, repetition_penalty=1.2 —
        weighted_selection/MiniCPMV20/modeling_minicpmv.py:360-392)."""
        assert len(images) <= 1, "minicpmv backend takes at most one image"
        arrs = build_encode_batch(tok, [(prompt, images[0] if images else
                                         None)], pcfg)
        s = int(arrs["attention_mask"][0].sum())
        vb = {k: jnp.asarray(arrs[k]) for k in
              ("patches", "patch_mask", "pos_matrix", "grid_h", "grid_w")} \
            if images else None
        ids, score = engine.beam_search(
            dict(input_ids=arrs["input_ids"][0, :s], vision_batch=vb,
                 slot_map=arrs["slot_map"][0, :s] if images else None),
            num_beams=3, max_new_tokens=max_new_tokens,
            repetition_penalty=1.2)
        return tok.decode(ids, skip_special_tokens=True), score

    def score_batch_fn(items):
        """Batched beam scoring: one (P*k,)-batched decode loop for all of
        a query's top-k pages (Engine.beam_search_batched) — results
        identical to sequential score_fn calls."""
        prompts = []
        for prompt, images in items:
            assert len(images) <= 1, "minicpmv backend takes at most one image"
            arrs = build_encode_batch(tok, [(prompt, images[0] if images
                                             else None)], pcfg)
            s = int(arrs["attention_mask"][0].sum())
            vb = {k: jnp.asarray(arrs[k]) for k in
                  ("patches", "patch_mask", "pos_matrix", "grid_h",
                   "grid_w")} if images else None
            prompts.append(dict(
                input_ids=arrs["input_ids"][0, :s], vision_batch=vb,
                slot_map=arrs["slot_map"][0, :s] if images else None))
        results = engine.beam_search_batched(
            prompts, num_beams=3, max_new_tokens=max_new_tokens,
            repetition_penalty=1.2)
        return [(tok.decode(ids, skip_special_tokens=True), score)
                for ids, score in results]

    score_fn.batched = score_batch_fn
    generate_fn.score_fn = score_fn
    return generate_fn


def _minicpmv26_backend(checkpoint: str, max_new_tokens: int,
                        max_slice_nums: int):
    """MiniCPM-V 2.6 (SigLIP + Qwen2-7B) on the TPU serving engine —
    multi-image capable (the reference runs task_type multi_image with 2.6,
    generate.py:122-145,243-267). generate_fn(prompt, images) →
    (text, cum_logprob)."""
    import jax.numpy as jnp
    from ..models.hf_loader import convert_minicpmv26, load_safetensors_dir
    from ..models.minicpmv26 import (MiniCPMV26Config,
                                     MiniCPMV26ForGeneration)
    from ..preprocess.pipeline import (PipelineConfig,
                                       build_multi_image_batch)
    from ..preprocess.tokenize import HFTokenizerAdapter, tokenize_prompt
    from ..serving.engine import Engine
    from ..serving.sampling import SamplingParams
    from .common import get_tokenizer

    hf_tok = get_tokenizer(checkpoint, trust_remote_code=True)
    tok = HFTokenizerAdapter(hf_tok)
    params = {"params": convert_minicpmv26(load_safetensors_dir(checkpoint))}
    cfg = MiniCPMV26Config(max_slice_nums=max_slice_nums)
    model = MiniCPMV26ForGeneration(cfg)
    eos = [i for i in (hf_tok.eos_token_id,
                       hf_tok.convert_tokens_to_ids("<|im_end|>"))
           if isinstance(i, int) and i >= 0]
    engine = Engine(model, params, num_slots=4, max_len=8192,
                    prompt_buckets=(2048, 4096, 8192), eos_token_ids=eos)
    pcfg = PipelineConfig(
        seq_len=8192, query_num=cfg.query_num, patch_size=cfg.patch_size,
        src_grid=cfg.vit.pos_grid, scale_resolution=cfg.scale_resolution,
        max_slice_nums=cfg.max_slice_nums, max_patches=1152)
    sampling = SamplingParams(temperature=0.0, max_tokens=max_new_tokens)

    def generate_fn(prompt, images):
        if images:
            # device_mode: ship uint8 pixels; the model builds pos operators
            # in-jit (host dense pos at grid 70 is ~23 MB/slice)
            b = build_multi_image_batch(
                tok, images,
                lambda phs: ("<|im_start|>user\n" + "\n".join(phs) + "\n" +
                             prompt + "<|im_end|>\n<|im_start|>assistant\n"),
                pcfg, device_mode=True)
            s = int(b["attention_mask"][0].sum())
            vb = {k: jnp.asarray(b[k]) for k in
                  ("pixels", "patch_mask", "grid_h", "grid_w")}
            reqs = [dict(input_ids=b["input_ids"][0, :s], vision_batch=vb,
                         slot_map=b["slot_map"][0, :s])]
        else:
            ids = tokenize_prompt(
                tok, "<|im_start|>user\n" + prompt +
                "<|im_end|>\n<|im_start|>assistant\n", pcfg.seq_len,
                add_bos=False)
            reqs = [dict(input_ids=ids)]
        req = engine.generate_detailed(reqs, sampling=sampling)[0]
        return hf_tok.decode(req.output_ids, skip_special_tokens=True), \
            req.cum_logprob

    return generate_fn


def _minicpm_backend(checkpoint: str, max_new_tokens: int):
    """Plain MiniCPM-2B text backend (the OCR-text baseline,
    generate.py:249-251). generate_fn(prompt, []) → (text, cum_logprob)."""
    from ..models.hf_loader import convert_minicpm_lm, load_safetensors_dir
    from ..models.minicpm import MiniCPMForGeneration, MiniCPMGenConfig
    from ..preprocess.tokenize import HFTokenizerAdapter, tokenize_prompt
    from ..serving.engine import Engine
    from ..serving.sampling import SamplingParams
    from .common import get_tokenizer

    hf_tok = get_tokenizer(checkpoint, trust_remote_code=True)
    cfg = MiniCPMGenConfig()
    model = MiniCPMForGeneration(cfg)
    params = {"params": convert_minicpm_lm(
        load_safetensors_dir(checkpoint))}
    engine = Engine(model, params, num_slots=4, max_len=4096,
                    prompt_buckets=(1024, 2048, 4096),
                    eos_token_ids=[hf_tok.eos_token_id])
    sampling = SamplingParams(temperature=0.0, max_tokens=max_new_tokens)

    def generate_fn(prompt, images):
        assert not images, "minicpm backend is text-only (task_type text)"
        ids = tokenize_prompt(HFTokenizerAdapter(hf_tok), prompt, 4096)
        req = engine.generate_detailed([dict(input_ids=ids)],
                                       sampling=sampling)[0]
        return hf_tok.decode(req.output_ids, skip_special_tokens=True), \
            req.cum_logprob

    return generate_fn


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-name", required=True)
    ap.add_argument("--queries", required=True,
                    help="jsonl rows {qid, query, answer, options?}")
    ap.add_argument("--corpus-dir", default=None,
                    help="directory of <docid>.png page images, or a jsonl "
                         "of {docid, text} for --task-type text")
    ap.add_argument("--trec", default=None, help="TREC run file/dir")
    ap.add_argument("--use-positive-sample", action="store_true")
    ap.add_argument("--task-type", default="multi_image",
                    choices=["text", "page_concatenation",
                             "weighted_selection", "multi_image"])
    ap.add_argument("--topk", type=int, default=3)
    ap.add_argument("--table-dir", default=None)
    ap.add_argument("--backend", default="minicpmv",
                    choices=["minicpmv", "minicpmv26", "minicpm", "gpt4o"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--openai-api-key", default=None)
    ap.add_argument("--max-new-tokens", type=int, default=20)
    ap.add_argument("--max-slice-nums", type=int, default=9)
    ap.add_argument("--output-dir", required=True)
    args = ap.parse_args(argv)

    examples = [json.loads(l) for l in open(args.queries)]
    run = None
    if not args.use_positive_sample:
        from ..retrieval.trec import load_from_trec
        import glob as _glob
        run = {}
        paths = [args.trec] if os.path.isfile(args.trec) else \
            sorted(_glob.glob(os.path.join(args.trec, "*.trec")))
        for p in paths:
            run.update(load_from_trec(p))

    corpus = None
    if args.task_type == "text" and args.dataset_name != "ChartQA":
        corpus = {json.loads(l)["docid"]: json.loads(l)["text"]
                  for l in open(args.corpus_dir)}
    elif args.task_type != "text":
        from PIL import Image

        class _LazyCorpus(dict):
            def __missing__(self, docid):
                for ext in (".png", ".jpg", ".jpeg", ""):
                    p = os.path.join(args.corpus_dir, docid + ext)
                    if os.path.exists(p):
                        img = Image.open(p).convert("RGB")
                        self[docid] = img
                        return img
                raise KeyError(docid)
        corpus = _LazyCorpus()

    if args.backend == "gpt4o":
        from ..generation.gen_eval import gpt4o_backend
        call = gpt4o_backend(api_key=args.openai_api_key)

        def generate_fn(prompt, images):
            assert not images, "gpt4o backend here is text-only (task text)"
            return call(prompt, args.max_new_tokens), 0.0
    elif args.backend == "minicpmv26":
        generate_fn = _minicpmv26_backend(args.checkpoint,
                                          args.max_new_tokens,
                                          args.max_slice_nums)
    elif args.backend == "minicpm":
        generate_fn = _minicpm_backend(args.checkpoint, args.max_new_tokens)
    else:
        generate_fn = _minicpmv_backend(args.checkpoint, args.max_new_tokens,
                                        args.max_slice_nums)

    acc, records = run_generate_eval(
        args.dataset_name, examples, generate_fn, task_type=args.task_type,
        topk=args.topk, run=run, use_positive_sample=args.use_positive_sample,
        corpus=corpus, table_dir=args.table_dir)

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir,
                           f"{args.dataset_name}_{args.task_type}.jsonl"),
              "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    result = {"dataset": args.dataset_name, "task_type": args.task_type,
              "topk": args.topk, "n": len(records), "accuracy": acc}
    with open(os.path.join(args.output_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
