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
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--qrels", default=None)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--phase", default="all",
                    choices=["all", "encode", "retrieve", "eval"])
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--corpus-quant", default="none", choices=["none", "int8"],
                    help="int8: per-row-quantized corpus scan — half the HBM "
                         "bytes (≈2x scan speed), double the resident corpus")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--query-template", default="Represent this query for "
                    "retrieving relevant documents: <query>")
    ap.add_argument("--doc-template", default="<text>")
    ap.add_argument("--max-inp-length", type=int, default=2048)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random model (smoke runs)")
    args = ap.parse_args(argv)

    from ..config import MeshConfig, ModelConfig
    from ..data.datasets import InferenceDataset, batched
    from ..mesh import build_mesh
    from ..models.visrag_ret import EncodeBatch
    from ..preprocess.pipeline import build_encode_batch
    from ..retrieval.encode import EmbeddingWriter
    from ..retrieval.metrics import evaluate_run
    from ..retrieval.search import StreamingSearcher, build_run
    from ..retrieval.trec import load_beir_qrels, load_from_trec, save_as_trec
    from .common import build_tokenizer, build_visrag_ret

    os.makedirs(args.output_dir, exist_ok=True)
    mcfg = ModelConfig(checkpoint=args.checkpoint,
                       max_inp_length=args.max_inp_length)
    model, params, pcfg = build_visrag_ret(mcfg, tiny=args.tiny)
    tok = build_tokenizer(args.checkpoint)
    from ..preprocess.device import finish_encode_batch
    from ..preprocess.transform import bicubic_table
    pos_table = bicubic_table(pcfg.src_grid)   # jit-closure constant
    apply = jax.jit(
        lambda p, raw: model.apply(p, finish_encode_batch(raw, pos_table)))

    def encode_file(path, template, out_prefix):
        ds = InferenceDataset(path, template=template)
        writer = EmbeddingWriter(args.output_dir, prefix=out_prefix)
        slots = args.batch_size * pcfg.max_slices_per_page
        for batch in batched(iter(ds), args.batch_size):
            ids = [b[0] for b in batch]
            items = [(text, img) for _, text, img in batch]
            while len(items) < args.batch_size:   # pad final batch
                items.append(("", None))
            # per-batch patch-buffer bucket (ladder rungs each jit once)
            from ..preprocess.pipeline import pick_patch_bucket
            bcfg = dataclasses.replace(
                pcfg, max_patches=min(pcfg.max_patches,
                                      pick_patch_bucket(items, pcfg)))
            # device-side input pipeline: host stops at uint8 patches
            arrs = build_encode_batch(tok, items, bcfg, n_slice_slots=slots,
                                      device_mode=True)
            reps = np.asarray(apply(params, arrs), np.float32)[:len(ids)]
            writer.add(ids, reps)
        return writer.result()

    trec_path = os.path.join(args.output_dir, "test.trec")

    if args.phase in ("all", "encode", "retrieve"):
        print("encoding corpus...", file=sys.stderr)
        doc_ids, doc_reps = encode_file(args.corpus, args.doc_template,
                                        "embeddings.corpus")
        print("encoding queries...", file=sys.stderr)
        q_ids, q_reps = encode_file(args.queries, args.query_template,
                                    "embeddings.query")
        print("retrieving...", file=sys.stderr)
        mesh = build_mesh(MeshConfig())
        searcher = StreamingSearcher(mesh, k=min(args.depth, len(doc_ids)),
                                     quant=args.corpus_quant)
        scores, idx = searcher.search(q_reps, [(doc_reps, 0)])
        run = build_run(scores, idx, q_ids, doc_ids)
        save_as_trec(run, trec_path)
        print(f"run saved to {trec_path}", file=sys.stderr)

    if args.phase in ("all", "eval") and args.qrels:
        run = load_from_trec(trec_path)
        qrels = load_beir_qrels(args.qrels)
        metrics = evaluate_run(run, qrels, k=args.depth)
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
