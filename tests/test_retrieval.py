"""Retrieval engine: metrics, TREC IO, sharded top-k on the 8-device mesh, and
the minimum end-to-end slice (tiny VisRAG-Ret → encode → retrieve → metrics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visrag_tpu.config import MeshConfig
from visrag_tpu.mesh import build_mesh
from visrag_tpu.retrieval.metrics import (evaluate_run, mrr_at_k, ndcg_at_k,
                                          recall_at_k)
from visrag_tpu.retrieval.search import (StreamingSearcher, build_run,
                                         make_sharded_topk, shard_corpus,
                                         topk_single)
from visrag_tpu.retrieval.trec import (load_beir_qrels, load_from_trec,
                                       merge_runs_by_score, save_as_trec)


def test_metrics_hand_computed():
    run = {"q1": {"d1": 0.9, "d2": 0.8, "d3": 0.7},
           "q2": {"d1": 0.9, "d2": 0.8}}
    qrels = {"q1": {"d2": 1}, "q2": {"d3": 1}}
    ndcg = ndcg_at_k(run, qrels, 10)
    assert ndcg["q1"] == pytest.approx(1.0 / np.log2(3))
    assert ndcg["q2"] == 0.0
    rec = recall_at_k(run, qrels, 10)
    assert rec == {"q1": 1.0, "q2": 0.0}
    mrr = mrr_at_k(run, qrels, 10)
    assert mrr["q1"] == 0.5 and mrr["all"] == 0.25
    agg = evaluate_run(run, qrels, 10)
    assert agg["recall_10"] == 0.5


def test_metrics_vs_reference_mrr():
    """Our MRR matches the reference eval_mrr on random runs."""
    from ref_oracle import load_functions
    ref_mrr = load_functions("src/openmatch/utils.py", ["eval_mrr"])["eval_mrr"]
    rng = np.random.default_rng(0)
    qrels = {f"q{i}": {f"d{rng.integers(0, 50)}": 1} for i in range(20)}
    run = {f"q{i}": {f"d{j}": float(rng.normal())
                     for j in rng.choice(50, size=10, replace=False)}
           for i in range(20)}
    got = mrr_at_k(run, qrels, 10)
    want = ref_mrr(qrels, run, 10)
    assert got["all"] == pytest.approx(want["all"])


def test_trec_roundtrip(tmp_path):
    run = {"q1": {"d1": 1.5, "d2": 0.25}, "q2": {"d9": -0.5}}
    p = str(tmp_path / "out" / "test.trec")
    save_as_trec(run, p)
    loaded = load_from_trec(p)
    assert loaded == run
    merged = merge_runs_by_score([run, {"q1": {"d1": 2.0}}], topk=1)
    assert merged["q1"] == {"d1": 2.0}


def test_qrels_loader(tmp_path):
    p = tmp_path / "qrels.tsv"
    p.write_text("query-id\tcorpus-id\tscore\nq1\td1\t1\nq1\td2\t0\n")
    qrels = load_beir_qrels(str(p))
    assert qrels == {"q1": {"d1": 1, "d2": 0}}


def test_sharded_topk_exact():
    mesh = build_mesh(MeshConfig(data=8))
    rng = np.random.default_rng(1)
    q = rng.normal(size=(6, 32)).astype(np.float32)
    c = rng.normal(size=(101, 32)).astype(np.float32)
    fn = make_sharded_topk(mesh, k=10)
    cs = shard_corpus(c, mesh)
    s, i = fn(jnp.asarray(q), cs, jnp.int32(101))
    s, i = np.asarray(s), np.asarray(i)
    ref_s, ref_i = topk_single(jnp.asarray(q), jnp.asarray(c), 10)
    # padded corpus rows are zero vectors; exclude any entries pointing there
    valid = i < 101
    np.testing.assert_allclose(s[valid], np.asarray(ref_s)[valid], rtol=1e-5)
    np.testing.assert_array_equal(i[valid], np.asarray(ref_i)[valid])


def test_streaming_searcher_matches_full():
    mesh = build_mesh(MeshConfig(data=8))
    rng = np.random.default_rng(2)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    c = rng.normal(size=(230, 16)).astype(np.float32)
    searcher = StreamingSearcher(mesh, k=7)
    chunks = [(c[:100], 0), (c[100:], 100)]
    s, i = searcher.search(q, chunks)
    ref_s, ref_i = (np.asarray(x) for x in topk_single(jnp.asarray(q),
                                                       jnp.asarray(c), 7))
    np.testing.assert_allclose(s, ref_s, rtol=1e-5)
    np.testing.assert_array_equal(i, ref_i)
    run = build_run(s, i, [f"q{n}" for n in range(4)],
                    [f"d{n}" for n in range(230)])
    assert len(run["q0"]) == 7


def test_end_to_end_tiny_slice():
    """SURVEY.md §7.2 minimum slice with a tiny random model: pages → encode →
    retrieve → self-retrieval sanity (a page's own embedding ranks first)."""
    from PIL import Image
    from visrag_tpu.models.visrag_ret import VisRAGRet, VisRAGRetConfig
    from visrag_tpu.preprocess.pipeline import PipelineConfig, build_encode_batch
    from visrag_tpu.preprocess.tokenize import MockTokenizer
    from visrag_tpu.preprocess.slicing import MAX_PATCHES

    cfg = VisRAGRetConfig.tiny()
    model = VisRAGRet(cfg)
    tok = MockTokenizer()
    pcfg = PipelineConfig(seq_len=256, query_num=cfg.backbone.query_num,
                          patch_size=cfg.backbone.vit.patch_size,
                          src_grid=cfg.backbone.vit.pos_grid,
                          scale_resolution=8, max_patches=64,
                          max_slices_per_page=10)

    rng = np.random.default_rng(3)
    pages = []
    for i in range(3):
        arr = rng.integers(0, 255, size=(40, 30, 3), dtype=np.uint8)
        pages.append(("", Image.fromarray(arr)))
    batch = build_encode_batch(tok, pages, pcfg)

    import dataclasses
    from visrag_tpu.models.visrag_ret import EncodeBatch
    eb = EncodeBatch(**{k: jnp.asarray(v) for k, v in batch.items()})
    params = model.init(jax.random.PRNGKey(0), eb)
    reps = np.asarray(model.apply(params, eb))
    assert reps.shape[0] == 3
    np.testing.assert_allclose(np.linalg.norm(reps, axis=1), 1.0, rtol=1e-4)

    # queries = the same pages (self-retrieval must be identity)
    s, i = topk_single(jnp.asarray(reps), jnp.asarray(reps), 3)
    assert (np.asarray(i)[:, 0] == np.arange(3)).all()

    # different pages give different embeddings
    assert not np.allclose(reps[0], reps[1])


def test_encode_dataset_writer(tmp_path):
    from visrag_tpu.retrieval.encode import EmbeddingWriter, encode_dataset

    def fake_step(**batch):
        return jnp.asarray(batch["x"].sum(axis=1, keepdims=True))

    batches = [([f"id{i}a", f"id{i}b"], dict(x=np.ones((2, 4), np.float32) * i))
               for i in range(5)]
    writer = EmbeddingWriter(str(tmp_path), max_inmem_docs=4)
    ids, reps = encode_dataset(fake_step, batches, writer=writer)
    assert len(ids) == 10 and reps.shape == (10, 1)
    np.testing.assert_allclose(reps[:, 0], np.repeat(np.arange(5) * 4.0, 2))


def test_encode_dataset_staged_prefetch():
    """Chained prefetch stages (build thread ∥ upload thread ∥ consume) keep
    ordering and results identical to the direct path (bench.py sustained
    pipeline shape)."""
    import threading
    from visrag_tpu.retrieval.encode import encode_dataset, prefetch

    def fake_step(**batch):
        return jnp.asarray(batch["x"].sum(axis=1, keepdims=True))

    def gen():
        for i in range(7):
            yield ([f"id{i}"], dict(x=np.ones((1, 4), np.float32) * i))

    stage_threads = []

    def upload(it):
        for ids_b, b in it:
            stage_threads.append(threading.get_ident())
            yield ids_b, {k: jnp.asarray(v) for k, v in b.items()}

    ids, reps = encode_dataset(fake_step, upload(prefetch(gen(), 2)))
    assert ids == [f"id{i}" for i in range(7)]
    np.testing.assert_allclose(reps[:, 0], np.arange(7) * 4.0)
    # the upload stage body ran inside encode_dataset's prefetch worker,
    # not the main thread (i.e. the stages really are separate threads)
    assert set(stage_threads) and threading.get_ident() not in set(stage_threads)


def test_int8_quantize_rows_bounds():
    """q * scale reconstructs x within scale/2 per element; zero rows safe."""
    from visrag_tpu.retrieval.search import quantize_rows, quantize_rows_np

    rng = np.random.default_rng(3)
    x = rng.normal(size=(33, 24)).astype(np.float32)
    x[7] = 0.0
    q, s = (np.asarray(a) for a in quantize_rows(jnp.asarray(x)))
    assert q.dtype == np.int8
    assert np.all(np.abs(q * s[:, None] - x) < s[:, None] / 2 + 1e-7)
    # host quantizer is bit-identical to the jit one
    qh, sh = quantize_rows_np(x)
    np.testing.assert_array_equal(q, qh)
    np.testing.assert_array_equal(s, sh)


def test_topk_int8_planted_neighbors():
    """int8 corpus search returns the planted nearest neighbors exactly and
    scores within the quantization error bound of the fp32 search."""
    from visrag_tpu.retrieval.search import quantize_rows, topk_single_int8

    rng = np.random.default_rng(4)
    c = rng.normal(size=(300, 64)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    planted = [17, 111, 299]
    q = c[planted] * 0.9  # exact-direction neighbors → unambiguous top-1
    cq, cs = quantize_rows(jnp.asarray(c))
    s8, i8 = (np.asarray(a) for a in topk_single_int8(
        jnp.asarray(q), cq, cs, 5))
    sf, _ = (np.asarray(a) for a in topk_single(jnp.asarray(q),
                                                jnp.asarray(c), 5))
    np.testing.assert_array_equal(i8[:, 0], planted)
    np.testing.assert_allclose(s8, sf, rtol=0, atol=0.02)


def test_sharded_topk_int8_matches_single():
    """Sharded int8 search == single-device int8 search (same quantized math,
    merged over the 8-device mesh)."""
    from visrag_tpu.retrieval.search import (quantize_rows,
                                             shard_corpus_int8,
                                             topk_single_int8)

    mesh = build_mesh(MeshConfig(data=8))
    rng = np.random.default_rng(5)
    q = rng.normal(size=(6, 32)).astype(np.float32)
    c = rng.normal(size=(101, 32)).astype(np.float32)
    cq_np, cs_np = (np.asarray(a) for a in quantize_rows(jnp.asarray(c)))
    fn = make_sharded_topk(mesh, k=10, quant="int8")
    cq, cs = shard_corpus_int8(cq_np, cs_np, mesh)
    s, i = fn(jnp.asarray(q), cq, cs, jnp.int32(101))
    s, i = np.asarray(s), np.asarray(i)
    ref_s, ref_i = (np.asarray(a) for a in topk_single_int8(
        jnp.asarray(q), jnp.asarray(cq_np), jnp.asarray(cs_np), 10))
    valid = i < 101
    np.testing.assert_allclose(s[valid], ref_s[valid], rtol=1e-5)
    np.testing.assert_array_equal(i[valid], ref_i[valid])


def test_streaming_searcher_int8():
    """StreamingSearcher(quant="int8") merges chunked int8 scans to the same
    result as one-shot int8 search (per-row scales make chunking invisible)."""
    from visrag_tpu.retrieval.search import quantize_rows, topk_single_int8

    mesh = build_mesh(MeshConfig(data=8))
    rng = np.random.default_rng(6)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    c = rng.normal(size=(230, 16)).astype(np.float32)
    searcher = StreamingSearcher(mesh, k=7, quant="int8")
    s, i = searcher.search(q, [(c[:100], 0), (c[100:], 100)])
    cq, cs = quantize_rows(jnp.asarray(c))
    ref_s, ref_i = (np.asarray(a) for a in topk_single_int8(
        jnp.asarray(q), cq, cs, 7))
    np.testing.assert_allclose(s, ref_s, rtol=1e-5)
    np.testing.assert_array_equal(i, ref_i)


def test_self_retrieve():
    """Query↔query retrieval (dense_retriever.py:100-161): each query's top
    hit is itself; duplicates surface at near-1.0 cosine."""
    import numpy as np
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh
    from visrag_tpu.retrieval.search import self_retrieve

    rng = np.random.default_rng(0)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q[5] = q[2]  # a duplicate pair
    qids = [f"q{i}" for i in range(8)]
    run = self_retrieve(q, qids, build_mesh(MeshConfig(data=8)), k=3)
    for i, qid in enumerate(qids):
        top = max(run[qid], key=run[qid].get)
        assert top in (qid, "q2" if qid == "q5" else qid)
    assert run["q2"]["q5"] == pytest.approx(1.0, abs=1e-5)


def test_retriever_trainer_resume(tmp_path):
    """Kill-and-resume for the contrastive trainer: params/opt/step restore
    and training continues from the next batch."""
    import jax
    import numpy as np
    from visrag_tpu.config import TrainConfig
    from visrag_tpu.models.visrag_ret import VisRAGRet, VisRAGRetConfig
    from visrag_tpu.training.trainer import RetrieverTrainer
    from __graft_entry__ import _build_batch

    cfg = VisRAGRetConfig.tiny()
    model = VisRAGRet(cfg)
    eb = _build_batch(cfg, seq_len=64, batch_pages=2, slice_slots=10,
                      max_patches=16, scale_resolution=8)
    params0 = model.init(jax.random.PRNGKey(0), eb)["params"]

    def encode(p, batch, rng):
        del rng
        return model.apply({"params": p}, batch)

    tcfg = TrainConfig(lr=1e-3, softmax_temperature=0.02, n_passages=1,
                       log_every=1, save_every=1)
    import jax.numpy as jnp

    def fresh():
        return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                      params0)

    t1 = RetrieverTrainer(encode, fresh(), tcfg, total_steps=2)
    t1.train([(eb, eb)], checkpoint_dir=str(tmp_path))
    assert t1.step == 1

    t2 = RetrieverTrainer(encode, fresh(), tcfg, total_steps=2)
    assert t2.maybe_resume(str(tmp_path)) == 1
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    t2.train([(eb, eb)])
    assert t2.step == 2
