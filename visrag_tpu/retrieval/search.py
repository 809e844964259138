"""Exact dense top-k retrieval on TPU: sharded Q@Cᵀ + distributed merge.

Replaces the reference's per-rank pickle-shard loop
(/root/reference/src/openmatch/retriever/dense_retriever.py:13-97): instead of
each GPU process loading pickle shards and looping, the corpus lives sharded
over the mesh's (replica, data) axes in HBM, every device scores its shard on
the MXU, takes a local top-k, and a single all_gather of (k × n_shards)
candidates per query yields the exact global top-k — one pjit program, no
filesystem boundary. A host-side streaming wrapper handles corpora larger than
HBM (the max_inmem_docs role, inference.py:112-131).
"""

from __future__ import annotations

import functools
from typing import Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mesh import DATA, REPLICA


def topk_single(queries: jax.Array, corpus: jax.Array, k: int):
    """(Q, D), (C, D) → scores (Q, k), indices (Q, k). fp32 scores."""
    scores = jnp.einsum("qd,cd->qc", queries.astype(jnp.float32),
                        corpus.astype(jnp.float32))
    return jax.lax.top_k(scores, k)


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization: (N, D) → (q int8 (N, D),
    scale f32 (N,)) with x ≈ q * scale.

    The brute-force corpus scan is HBM-bandwidth-bound (the matmul FLOPs per
    query are trivial), so halving the bytes per row vs bf16 halves the scan
    time and doubles the corpus rows one chip can hold — a capacity/latency
    feature the reference's pickle-shard scan (dense_retriever.py:37-97) has
    no analogue of. Per-row max-abs scaling keeps the relative score error
    ≤ ~1/127 per side, far below typical retrieval score margins."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def topk_single_int8(queries: jax.Array, corpus_q: jax.Array,
                     corpus_scale: jax.Array, k: int):
    """int8-corpus top-k: queries (Q, D) any float dtype, corpus_q int8
    (C, D) + per-row scales (C,). Queries are quantized symmetrically on the
    fly; the s8×s8 dot accumulates in int32 on the MXU and scores are
    rescaled to f32 before top-k."""
    qq, qs = quantize_rows(queries)
    acc = jax.lax.dot_general(qq, corpus_q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    scores = acc.astype(jnp.float32) * qs[:, None] * corpus_scale[None, :]
    return jax.lax.top_k(scores, k)


def make_sharded_topk(mesh: Mesh, k: int, quant: str = "none"):
    """Build a jitted sharded top-k: corpus rows sharded over (replica, data).

    quant="none": fn(queries (Q,D) replicated, corpus (C,D) sharded, n_true)
    quant="int8": fn(queries, corpus_q int8 (C,D) sharded, corpus_scale f32
    (C,) sharded, n_true) — see quantize_rows for the bandwidth rationale.
    Both return (scores (Q,k), global indices (Q,k)).
    """
    axes = (REPLICA, DATA)

    def merge(scores, n_true, shard_id, rows):
        # zero-padded rows must never outrank real (possibly negative) scores
        global_rows = shard_id * rows + jnp.arange(rows)
        scores = jnp.where(global_rows[None, :] < n_true, scores, -jnp.inf)
        k_local = min(k, rows)
        s, idx = jax.lax.top_k(scores, k_local)
        if k_local < k:
            pad = k - k_local
            s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            idx = jnp.pad(idx, ((0, 0), (0, pad)))
        idx = idx + shard_id * rows
        # gather candidates from all shards → exact global top-k
        s_all = jax.lax.all_gather(s, axes, axis=1, tiled=True)     # (Q, n*k)
        idx_all = jax.lax.all_gather(idx, axes, axis=1, tiled=True)
        best_s, best_pos = jax.lax.top_k(s_all, k)
        best_idx = jnp.take_along_axis(idx_all, best_pos, axis=1)
        return best_s, best_idx

    def local(queries, corpus_shard, n_true):
        # corpus_shard: (C/n, D) on each device; shard may hold fewer than k
        scores = jnp.einsum("qd,cd->qc", queries.astype(jnp.float32),
                            corpus_shard.astype(jnp.float32))
        return merge(scores, n_true, jax.lax.axis_index(axes),
                     corpus_shard.shape[0])

    def local_int8(queries, corpus_q, corpus_scale, n_true):
        qq, qs = quantize_rows(queries)
        acc = jax.lax.dot_general(qq, corpus_q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        scores = acc.astype(jnp.float32) * qs[:, None] * corpus_scale[None, :]
        return merge(scores, n_true, jax.lax.axis_index(axes),
                     corpus_q.shape[0])

    if quant == "int8":
        fn = jax.shard_map(
            local_int8, mesh=mesh,
            in_specs=(P(), P((REPLICA, DATA), None), P((REPLICA, DATA)), P()),
            out_specs=(P(), P()),
            check_vma=False)
    else:
        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P((REPLICA, DATA), None), P()),
            out_specs=(P(), P()),
            check_vma=False)  # outputs identical on all devices post-gather
    return jax.jit(fn)


def shard_corpus(corpus: np.ndarray, mesh: Mesh) -> jax.Array:
    """Pad rows to shard-divisible and device_put sharded over (replica,data).
    Padding rows are zero → score 0; callers must request k ≤ true corpus size
    or filter padded indices (idx >= len(corpus))."""
    n = mesh.shape[REPLICA] * mesh.shape[DATA]
    c = corpus.shape[0]
    pad = (-c) % n
    if pad:
        corpus = np.concatenate(
            [corpus, np.zeros((pad, corpus.shape[1]), corpus.dtype)], axis=0)
    sharding = NamedSharding(mesh, P((REPLICA, DATA), None))
    return jax.device_put(corpus, sharding)


def quantize_rows_np(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side quantize_rows (exact same math, numpy): quantizing corpus
    chunks BEFORE device_put also halves host→device upload bytes — the
    dominant cost when streaming a corpus through a thin link."""
    x = np.asarray(x, np.float32)
    amax = np.max(np.abs(x), axis=1)
    scale = np.where(amax > 0, amax, 1.0).astype(np.float32) / 127.0
    q = np.clip(np.rint(x / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale


def shard_corpus_int8(corpus_q: np.ndarray, corpus_scale: np.ndarray,
                      mesh: Mesh) -> Tuple[jax.Array, jax.Array]:
    """shard_corpus for a quantized corpus: pads rows+scales together.
    Padded rows are zero with scale 1 → score exactly 0 pre-mask."""
    n = mesh.shape[REPLICA] * mesh.shape[DATA]
    c = corpus_q.shape[0]
    pad = (-c) % n
    if pad:
        corpus_q = np.concatenate(
            [corpus_q, np.zeros((pad, corpus_q.shape[1]), np.int8)], axis=0)
        corpus_scale = np.concatenate(
            [corpus_scale, np.ones((pad,), np.float32)], axis=0)
    q = jax.device_put(corpus_q,
                       NamedSharding(mesh, P((REPLICA, DATA), None)))
    s = jax.device_put(corpus_scale.astype(np.float32),
                       NamedSharding(mesh, P((REPLICA, DATA))))
    return q, s


class StreamingSearcher:
    """Exact top-k over a corpus streamed in chunks (HBM-bounded).

    Each chunk is scored with the sharded kernel; running top-k is merged on
    host. Equivalent to the reference's loop over pickle shards
    (dense_retriever.py:37-97) but with on-TPU scoring."""

    def __init__(self, mesh: Mesh, k: int, quant: str = "none"):
        self.mesh = mesh
        self.k = k
        self.quant = quant
        self._fn = make_sharded_topk(mesh, k, quant=quant)

    def search(self, queries: np.ndarray,
               corpus_chunks: Iterable[Tuple[np.ndarray, int]]):
        """corpus_chunks yields (chunk_array, base_index). Returns
        (scores (Q,k), global indices (Q,k)) numpy arrays. With quant="int8"
        each chunk is per-row-quantized on host (half the upload + HBM bytes,
        double the resident-corpus capacity)."""
        q = jax.device_put(jnp.asarray(queries),
                           NamedSharding(self.mesh, P()))
        best_s = best_i = None
        for chunk, base in corpus_chunks:
            true_n = chunk.shape[0]
            if self.quant == "int8":
                cq, cs = shard_corpus_int8(*quantize_rows_np(chunk),
                                           mesh=self.mesh)
                s, i = self._fn(q, cq, cs, jnp.int32(true_n))
            else:
                c = shard_corpus(chunk, self.mesh)
                s, i = self._fn(q, c, jnp.int32(true_n))
            s, i = np.asarray(s), np.asarray(i)
            i = i + base
            if best_s is None:
                best_s, best_i = s, i
            else:
                cat_s = np.concatenate([best_s, s], axis=1)
                cat_i = np.concatenate([best_i, i], axis=1)
                order = np.argsort(-cat_s, axis=1, kind="stable")[:, :self.k]
                best_s = np.take_along_axis(cat_s, order, axis=1)
                best_i = np.take_along_axis(cat_i, order, axis=1)
        return best_s, best_i


def self_retrieve(query_reps: np.ndarray, query_ids: List[str], mesh: Mesh,
                  k: int) -> dict:
    """Query↔query retrieval for near-duplicate detection
    (reference distributed_parallel_self_retrieve, dense_retriever.py:100-161:
    the query embeddings double as the corpus; self-matches are kept, as in
    the reference)."""
    searcher = StreamingSearcher(mesh, k)
    scores, indices = searcher.search(query_reps, [(query_reps, 0)])
    return build_run(scores, indices, query_ids, query_ids)


def build_run(scores: np.ndarray, indices: np.ndarray, query_ids: List[str],
              doc_ids: List[str]) -> dict:
    """(Q,k) arrays → TREC-style run dict."""
    run: dict = {}
    for qi, qid in enumerate(query_ids):
        docs = {}
        for s, di in zip(scores[qi], indices[qi]):
            if not np.isfinite(s):
                continue
            docs[doc_ids[int(di)]] = float(s)
        run[qid] = docs
    return run
