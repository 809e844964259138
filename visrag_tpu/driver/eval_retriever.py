"""Retrieval evaluation driver: encode → retrieve → metrics.

CLI parity with /root/reference/src/openmatch/driver/eval.py +
visrag_scripts/eval_retriever/eval.sh: phases encode_corpus / encode_query /
retrieve / eval, TREC run output, test_result.log with
ndcg_cut_10 / recall_10 / mrr_10.

    python -m visrag_tpu.driver.eval_retriever \
        --corpus corpus.parquet --queries queries.parquet \
        --qrels qrels.tsv --output-dir out/ [--phase all] [--depth 10]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--qrels", default=None)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--config", default=None, help="YAML EvalConfig")
    ap.add_argument("--set", action="append", default=[],
                    help="dotlist overrides, e.g. retrieval.depth=10")
    ap.add_argument("--phase", default=None,
                    choices=["all", "encode", "retrieve", "eval"])
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--corpus-quant", default="none", choices=["none", "int8"],
                    help="int8: per-row-quantized corpus scan — half the HBM "
                         "bytes (≈2x scan speed), double the resident corpus")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random model (smoke runs)")
    args = ap.parse_args(argv)

    from ..config import EvalConfig, load_config
    from ..data.datasets import InferenceDataset, batched
    from ..mesh import build_mesh
    from ..models.visrag_ret import EncodeBatch
    from ..preprocess.pipeline import build_encode_batch
    from ..retrieval.encode import EmbeddingWriter
    from ..retrieval.metrics import evaluate_run
    from ..retrieval.search import StreamingSearcher, build_run
    from ..retrieval.trec import load_beir_qrels, load_from_trec, save_as_trec
    from .common import build_tokenizer, build_visrag_ret

    # typed EvalConfig (the reference's InferenceArguments, arguments.py:
    # 231-264) merged default ← yaml ← dotlist; explicit CLI flags win last
    cfg = load_config(EvalConfig, yaml_path=args.config, dotlist=args.set)
    if args.corpus:
        cfg.data.corpus_path = args.corpus
    if args.queries:
        cfg.data.query_path = args.queries
    if args.qrels:
        cfg.data.qrels_path = args.qrels
    if args.checkpoint is not None:
        cfg.model.checkpoint = args.checkpoint
    if args.phase is not None:
        cfg.phase = args.phase
    if args.depth is not None:
        cfg.retrieval.depth = args.depth
    if args.batch_size is not None:
        cfg.data.batch_size = args.batch_size
    if not cfg.data.corpus_path or not cfg.data.query_path:
        ap.error("--corpus/--queries (or data.corpus_path/query_path) "
                 "required")
    batch_size = cfg.data.batch_size

    os.makedirs(args.output_dir, exist_ok=True)
    model, params, pcfg = build_visrag_ret(cfg.model, tiny=args.tiny)
    tok = build_tokenizer(cfg.model.checkpoint)
    from ..preprocess.device import finish_encode_batch
    from ..preprocess.transform import bicubic_table
    pos_table = bicubic_table(pcfg.src_grid)   # jit-closure constant
    apply = jax.jit(
        lambda p, raw: model.apply(p, finish_encode_batch(raw, pos_table)))

    def encode_file(path, template, out_prefix, max_len):
        """max_len: per-type token cap (reference eval.sh encodes queries at
        q_max_len=512, pages at p_max_len=2048)."""
        ds = InferenceDataset(path, template=template)
        writer = EmbeddingWriter(args.output_dir, prefix=out_prefix,
                                 max_inmem_docs=cfg.retrieval.max_inmem_docs)
        slots = batch_size * pcfg.max_slices_per_page
        for batch in batched(iter(ds), batch_size):
            ids = [b[0] for b in batch]
            items = [(text, img) for _, text, img in batch]
            while len(items) < batch_size:   # pad final batch
                items.append(("", None))
            # per-batch patch-buffer bucket (ladder rungs each jit once)
            from ..preprocess.pipeline import pick_patch_bucket
            bcfg = dataclasses.replace(
                pcfg, seq_len=min(max_len, pcfg.seq_len),
                max_patches=min(pcfg.max_patches,
                                pick_patch_bucket(items, pcfg)))
            # device-side input pipeline: host stops at uint8 patches
            arrs = build_encode_batch(tok, items, bcfg, n_slice_slots=slots,
                                      device_mode=True)
            reps = np.asarray(apply(params, arrs), np.float32)[:len(ids)]
            writer.add(ids, reps)
        return writer.result()

    trec_path = cfg.retrieval.trec_save_path or \
        os.path.join(args.output_dir, "test.trec")

    if cfg.phase in ("all", "encode", "retrieve"):
        print("encoding corpus...", file=sys.stderr)
        doc_ids, doc_reps = encode_file(cfg.data.corpus_path,
                                        cfg.data.doc_template,
                                        "embeddings.corpus",
                                        cfg.data.p_max_len)
        print("encoding queries...", file=sys.stderr)
        q_ids, q_reps = encode_file(cfg.data.query_path,
                                    cfg.data.query_template,
                                    "embeddings.query", cfg.data.q_max_len)
        print("retrieving...", file=sys.stderr)
        from ..config import MeshConfig
        mesh = build_mesh(MeshConfig())
        searcher = StreamingSearcher(
            mesh, k=min(cfg.retrieval.depth, len(doc_ids)),
            quant=args.corpus_quant)
        scores, idx = searcher.search(q_reps, [(doc_reps, 0)])
        run = build_run(scores, idx, q_ids, doc_ids)
        save_as_trec(run, trec_path)
        print(f"run saved to {trec_path}", file=sys.stderr)

    if cfg.phase in ("all", "eval") and cfg.data.qrels_path:
        run = load_from_trec(trec_path)
        qrels = load_beir_qrels(cfg.data.qrels_path)
        metrics = evaluate_run(run, qrels, k=cfg.retrieval.depth)
        log_path = os.path.join(args.output_dir, "test_result.log")
        with open(log_path, "w") as f:
            for k, v in metrics.items():
                line = "{:25s}{:8s}{:.4f}".format(k, "all", v)
                print(line)
                f.write(line + "\n")
        with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
