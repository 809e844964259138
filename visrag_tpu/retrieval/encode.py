"""Batched embedding inference engine.

Replaces the reference's distributed_parallel_embedding_inference
(/root/reference/src/openmatch/inference/inference.py:53-172): a single pjit'd
encode step over the mesh's data axis, host-side double buffering (the next
batch is preprocessed while the TPU runs the current one), NaN guard on the
first batch, and optional .npy spill shards for corpora larger than host RAM.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh import REPLICA, DATA
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_encode_step(model_apply: Callable, mesh: Optional[Mesh] = None):
    """model_apply(params, **batch) → reps. Returns jitted step with batch
    arrays sharded on dim 0 over (replica, data)."""
    if mesh is None:
        return jax.jit(model_apply)

    def place(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            spec = P((REPLICA, DATA), *([None] * (v.ndim - 1)))
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        return out

    step = jax.jit(model_apply,
                   out_shardings=NamedSharding(mesh, P((REPLICA, DATA), None)))
    return step, place


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Host-side pipeline: preprocess batch n+1 while TPU runs batch n.

    Stages compose: `encode_dataset` wraps its input in one prefetch stage, so
    a generator whose body is itself expensive (e.g. host→device upload) can be
    split from the raw preprocessing by chaining —

        raw = prefetch(build_batches(), depth)      # thread A: rasterize etc.
        def upload(it):
            for ids, b in it:
                yield ids, jax.device_put(b)        # runs in thread B (below)
        encode_dataset(step, upload(raw), ...)      # thread B: upload stage

    giving build ∥ upload ∥ device-compute triple overlap (the upload stage's
    body executes inside encode_dataset's own prefetch worker).
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


class EmbeddingWriter:
    """Collects (ids, reps) and spills .npy/.json shards every max_inmem docs
    (filename scheme mirrors inference.py:118-124 in spirit)."""

    def __init__(self, output_dir: Optional[str] = None,
                 prefix: str = "embeddings.corpus",
                 max_inmem_docs: int = 10_000_000):
        self.output_dir = output_dir
        self.prefix = prefix
        self.max_inmem = max_inmem_docs
        self.ids: List[str] = []
        self.reps: List[np.ndarray] = []
        self._count = 0
        self._shards: List[str] = []

    def add(self, ids: Sequence[str], reps: np.ndarray):
        self.ids.extend(ids)
        self.reps.append(reps)
        self._count += len(ids)
        if self.output_dir and self._count >= self.max_inmem:
            self.flush()

    def flush(self):
        if not self.output_dir or not self.ids:
            return
        import json
        os.makedirs(self.output_dir, exist_ok=True)
        shard_idx = len(self._shards)
        base = os.path.join(self.output_dir, f"{self.prefix}.{shard_idx}")
        np.save(base + ".npy", np.concatenate(self.reps, axis=0))
        with open(base + ".ids.json", "w") as f:
            json.dump(self.ids, f)
        self._shards.append(base)
        self.ids, self.reps, self._count = [], [], 0

    def result(self) -> Tuple[List[str], np.ndarray]:
        if self._shards:
            self.flush()
            import json
            ids, reps = [], []
            for base in self._shards:
                reps.append(np.load(base + ".npy"))
                with open(base + ".ids.json") as f:
                    ids.extend(json.load(f))
            return ids, np.concatenate(reps, axis=0)
        reps = (np.concatenate(self.reps, axis=0) if self.reps
                else np.zeros((0, 0), np.float32))
        return self.ids, reps


def encode_dataset(step, batches: Iterable[Tuple[Sequence[str], dict]],
                   place: Optional[Callable] = None,
                   params=None,
                   writer: Optional[EmbeddingWriter] = None,
                   prefetch_depth: int = 2) -> Tuple[List[str], np.ndarray]:
    """Run the encode loop. `batches` yields (ids, batch_dict); batch dicts may
    be padded on dim 0 — ids shorter than the batch mark the valid prefix.

    NaN guard on the first batch mirrors inference.py:105-108.
    """
    writer = writer or EmbeddingWriter()
    first = True
    for ids, batch in prefetch(iter(batches), prefetch_depth):
        if place is not None:
            batch = place(batch)
        reps = step(params, **batch) if params is not None else step(**batch)
        reps = np.asarray(jax.device_get(reps))[:len(ids)]
        if first:
            if np.isnan(reps).any():
                raise FloatingPointError("NaN embeddings in first batch")
            first = False
        writer.add(ids, reps)
    return writer.result()
