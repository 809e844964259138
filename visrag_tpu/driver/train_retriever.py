"""Retriever contrastive-training driver.

CLI parity with /root/reference/src/openmatch/driver/train.py +
visrag_scripts/train_retriever/train.sh (paper config: seq 2048, per-device
batch 16, τ=0.02, wmean pooling, 1 epoch, cross-device negatives, GradCache
optional).

    python -m visrag_tpu.driver.train_retriever \
        --train-data pairs.parquet --output-dir out/ [--config run.yaml] \
        [--set train.lr=5e-6 ...]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-data", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--config", default=None, help="YAML config")
    ap.add_argument("--set", action="append", default=[],
                    help="dotlist overrides, e.g. train.lr=1e-5")
    ap.add_argument("--tiny", action="store_true")
    # multi-host bootstrap (torchrun role; see mesh.init_distributed)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (multi-host runs)")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    args = ap.parse_args(argv)

    from ..mesh import init_distributed, multihost_mesh_config
    pid, nproc = init_distributed(args.coordinator, args.process_id,
                                  args.num_processes)

    from ..config import RetrieverTrainConfig, dump_config, load_config
    from ..data.datasets import MMDRTrainDataset, batched, qp_collate
    from ..mesh import build_mesh
    from ..models.visrag_ret import EncodeBatch
    from ..preprocess.pipeline import build_encode_batch
    from ..training.trainer import RetrieverTrainer
    from ..utils.tracker import Tracker
    from .common import build_tokenizer, build_visrag_ret

    import os
    cfg = load_config(RetrieverTrainConfig, yaml_path=args.config,
                      dotlist=args.set)
    cfg.train.output_dir = args.output_dir
    os.makedirs(args.output_dir, exist_ok=True)
    dump_config(cfg, os.path.join(args.output_dir, "run_config.json"))

    model, params, pcfg = build_visrag_ret(cfg.model, tiny=args.tiny)
    tok = build_tokenizer(cfg.model.checkpoint)
    mesh = build_mesh(multihost_mesh_config(cfg.mesh, nproc))
    # non-zero processes run the same collectives but stay silent on disk
    tracker = Tracker(args.output_dir) if pid == 0 else Tracker(None)

    slots = cfg.data.batch_size * pcfg.max_slices_per_page

    def encode(p, batch, rng):
        del rng
        return model.apply({"params": p}, batch)

    train_params = params["params"]
    lora_merge_fn = None
    if cfg.train.lora_rank > 0:
        # reference LoRA option (dense_retrieval_model.py:327-345): freeze
        # the base, train rank-r adapters on q_proj/v_proj
        from ..training.lora import lora_init, lora_merge, wrap_encode_with_lora
        import jax as _jax
        base = params["params"]
        train_params = lora_init(_jax.random.PRNGKey(0), base,
                                 rank=cfg.train.lora_rank)
        encode = wrap_encode_with_lora(encode, base,
                                       rank=cfg.train.lora_rank,
                                       alpha=cfg.train.lora_alpha)
        lora_merge_fn = lambda lt: lora_merge(  # noqa: E731
            base, lt, rank=cfg.train.lora_rank, alpha=cfg.train.lora_alpha)

    dataset = MMDRTrainDataset(args.train_data,
                               query_template=cfg.data.query_template)
    try:
        total = len(dataset) // cfg.data.batch_size * cfg.train.epochs
    except TypeError:
        total = max(cfg.train.max_steps, 1000)

    # checkpointable row cursor (StatefulDataLoader role): resume continues
    # at the exact dataset row rather than skipping batches by step count
    from ..data.datasets import StatefulIterator
    row_iter = StatefulIterator(lambda: iter(dataset), cycle=True)

    def batches():
        buf = []
        for item in row_iter:
            if row_iter.epoch >= cfg.train.epochs:
                break
            if row_iter.row == 1 and buf:
                buf = []          # new epoch started: drop the ragged tail
            buf.append(item)
            if len(buf) < cfg.data.batch_size:
                continue
            coll = qp_collate(buf)
            buf = []
            qb = build_encode_batch(tok, coll["queries"], pcfg,
                                    n_slice_slots=slots)
            pb = build_encode_batch(tok, coll["passages"], pcfg,
                                    n_slice_slots=slots)
            yield (EncodeBatch(**{k: jnp.asarray(v) for k, v in qb.items()}),
                   EncodeBatch(**{k: jnp.asarray(v) for k, v in pb.items()}))

    trainer = RetrieverTrainer(encode, train_params, cfg.train, mesh=mesh,
                               total_steps=total,
                               logger=lambda s, m: tracker.log(m, s))
    trainer.data_iter = row_iter
    done_steps = trainer.maybe_resume(args.output_dir)
    if done_steps:
        # the data cursor inside the checkpoint already fast-forwards
        # row_iter to the exact next batch — no islice step-skipping
        print(f"resumed from step {done_steps} "
              f"(data cursor {row_iter.state()})", file=sys.stderr)
    trainer.train(batches(), checkpoint_dir=args.output_dir)
    from ..training.checkpoint import save_checkpoint
    final = trainer.params if lora_merge_fn is None \
        else lora_merge_fn(trainer.params)   # save merged weights
    save_checkpoint(args.output_dir, trainer.step, {"params": final})
    tracker.close()
    print(f"done: {trainer.step} steps -> {args.output_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
