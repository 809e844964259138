"""CLI driver end-to-end smokes with tiny random models + synthetic data."""

import io
import json
import os

import numpy as np
import pytest
from PIL import Image


def _img_bytes(rng):
    img = Image.fromarray(rng.integers(0, 255, (24, 18, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def synth_data(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(0)
    corpus = pa.table({
        "corpus-id": [f"d{i}" for i in range(6)],
        "text": ["" for _ in range(6)],
        "image": [{"bytes": _img_bytes(rng)} for _ in range(6)],
    })
    pq.write_table(corpus, tmp_path / "corpus.parquet")
    queries = pa.table({
        "query-id": [f"q{i}" for i in range(3)],
        "query": [f"question number {i}" for i in range(3)],
    })
    pq.write_table(queries, tmp_path / "queries.parquet")
    (tmp_path / "qrels.tsv").write_text(
        "query-id\tcorpus-id\tscore\n" +
        "\n".join(f"q{i}\td{i}\t1" for i in range(3)) + "\n")
    train = pa.table({
        "query": [f"question {i}" for i in range(8)],
        "image": [{"bytes": _img_bytes(rng)} for _ in range(8)],
    })
    pq.write_table(train, tmp_path / "train.parquet")
    (tmp_path / "metadata.json").write_text('{"length": 8}')
    return tmp_path


def test_eval_retriever_driver(synth_data, tmp_path):
    from visrag_tpu.driver.eval_retriever import main
    out = tmp_path / "out"
    rc = main(["--corpus", str(synth_data / "corpus.parquet"),
               "--queries", str(synth_data / "queries.parquet"),
               "--qrels", str(synth_data / "qrels.tsv"),
               "--output-dir", str(out), "--tiny", "--batch-size", "2",
               "--depth", "5"])
    assert rc == 0
    assert (out / "test.trec").exists()
    metrics = json.loads((out / "metrics.json").read_text())
    assert set(metrics) == {"ndcg_cut_5", "recall_5", "mrr_5"}
    log = (out / "test_result.log").read_text()
    assert "recall_5" in log
    # TREC run is loadable and has depth entries per query
    from visrag_tpu.retrieval.trec import load_from_trec
    run = load_from_trec(str(out / "test.trec"))
    assert len(run) == 3 and all(len(v) == 5 for v in run.values())


def test_eval_retriever_driver_int8_corpus(synth_data, tmp_path):
    """--corpus-quant int8 runs the retrieve phase end-to-end (rank parity
    vs fp32 is covered by the planted-neighbor test in test_retrieval.py)."""
    from visrag_tpu.driver.eval_retriever import main
    from visrag_tpu.retrieval.trec import load_from_trec
    out = tmp_path / "out_int8"
    rc = main(["--corpus", str(synth_data / "corpus.parquet"),
               "--queries", str(synth_data / "queries.parquet"),
               "--output-dir", str(out), "--tiny", "--batch-size", "2",
               "--depth", "3", "--corpus-quant", "int8"])
    assert rc == 0
    run = load_from_trec(str(out / "test.trec"))
    assert len(run) == 3 and all(len(v) == 3 for v in run.values())


def test_train_retriever_driver(synth_data, tmp_path):
    from visrag_tpu.driver.train_retriever import main
    out = tmp_path / "trained"
    rc = main(["--train-data", str(synth_data / "train.parquet"),
               "--output-dir", str(out), "--tiny",
               "--set", "train.max_steps=2",
               "--set", "train.log_every=1", "--set", "data.batch_size=8"])
    assert rc == 0
    assert (out / "run_config.json").exists()
    from visrag_tpu.training.checkpoint import find_latest_ckpt
    assert find_latest_ckpt(str(out)) is not None
    assert (out / "metrics.jsonl").exists()


def test_demo_driver(tmp_path):
    from visrag_tpu.driver.demo import main
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "note.txt").write_text("the revenue in 2020 was 42 million\n" * 30)
    idx = tmp_path / "idx"
    rc = main(["build-index", "--input", str(docs), "--output", str(idx),
               "--tiny"])
    assert rc == 0
    reps = np.load(idx / "reps.npy")
    assert reps.shape[0] >= 1
    rc = main(["answer", "--index", str(idx), "--query", "what was the 2020 "
               "revenue", "--topk", "1", "--tiny"])
    assert rc == 0
    ans = json.loads((idx / "answer.json").read_text())
    assert ans["retrieved"]


def test_templates():
    from visrag_tpu.data.templates import fill_template, find_all_markers
    t = "Represent this query: <query> [<meta.lang>]"
    assert find_all_markers(t) == ["query", "meta.lang"]
    out = fill_template(t, {"query": "hi", "meta": {"lang": "en"}})
    assert out == "Represent this query: hi [en]"
    with pytest.raises(ValueError):
        fill_template("<missing>", {})
    assert fill_template("<missing>", {}, allow_not_found=True) == ""


def test_round_robin_sharding():
    from visrag_tpu.data.datasets import shard_round_robin
    items = list(range(20))
    shards = [list(shard_round_robin(items, batch_size=2, shard_index=i,
                                     num_shards=3)) for i in range(3)]
    # windows of 6: shard0 gets [0,1], shard1 [2,3], shard2 [4,5], then +6...
    assert shards[0][:4] == [0, 1, 6, 7]
    assert shards[1][:4] == [2, 3, 8, 9]
    assert sorted(sum(shards, [])) == items


def test_tracker_and_flops(tmp_path):
    from visrag_tpu.utils.flops import ModelDims, mfu, training_flops
    from visrag_tpu.utils.tracker import Timers, Tracker
    tr = Tracker(str(tmp_path))
    tr.log({"loss": 1.5, "acc": 0.5}, step=1)
    tr.close()
    rows = [json.loads(l) for l in
            (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert rows[0]["loss"] == 1.5

    dims = ModelDims(num_params=2.4e9, hidden_size=2304, num_layers=40,
                     num_heads=36)
    fl = training_flops(dims, total_tokens=1000, sum_seq_sq=1000 * 500)
    assert fl > 6 * 2.4e9 * 1000
    assert 0 < mfu(fl, seconds=1.0, peak_tflops=197.0) < 1

    t = Timers()
    with t("phase"):
        pass
    assert "timing_s/phase" in t.metrics()


def test_get_tokenizer_corrections(monkeypatch):
    """Pad-token and gemma-EOS corrections (ref verl/utils/tokenizer.py)."""
    import transformers
    from visrag_tpu.driver.common import get_processor, get_tokenizer

    class Stub:
        def __init__(self, bos, eos, pad_id):
            self.bos_token, self.eos_token = bos, eos
            self.pad_token_id, self.pad_token = pad_id, None
            self.chat_template = None

    stub = Stub("<s>", "</s>", None)
    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        staticmethod(lambda p, **kw: stub))
    tok = get_tokenizer("x", override_chat_template="TPL")
    assert tok.pad_token == "</s>" and tok.chat_template == "TPL"

    gem = Stub("<bos>", "<eos>", 0)
    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        staticmethod(lambda p, **kw: gem))
    assert get_tokenizer("x").eos_token == "<end_of_turn>"

    # AutoProcessor falling back to a bare tokenizer → None (text-only ckpt)
    monkeypatch.setattr(transformers.AutoProcessor, "from_pretrained",
                        staticmethod(lambda p, **kw: stub))
    assert get_processor("x") is None


def test_encode_qwen_prompt_row_multimodal():
    """RL driver row encoding (the reference RLHFDataset role): text-only
    rows, and multimodal rows with pad expansion, mrope positions, a flat
    slot map, and a uint8 device-mode vision batch."""
    import numpy as np
    from PIL import Image
    from visrag_tpu.config import RolloutConfig
    from visrag_tpu.driver.common import encode_qwen_prompt_row
    from visrag_tpu.models.qwen25_vl import Qwen25VLConfig

    mcfg = Qwen25VLConfig.tiny()
    PAD = mcfg.image_token_id

    class Proc:
        def apply_chat_template(self, msgs, **kw):
            parts = []
            for c in msgs[0]["content"]:
                parts.append("<|image_pad|>" if c["type"] == "image"
                             else c["text"])
            return "u:" + "".join(parts)

    class Tok:
        def encode(self, text, **kw):
            out = []
            i = 0
            while i < len(text):
                if text.startswith("<|image_pad|>", i):
                    out.append(PAD)
                    i += len("<|image_pad|>")
                else:
                    out.append(ord(text[i]) % 90)
                    i += 1
            return out

    rcfg = RolloutConfig(min_pixels=16 * 16, max_pixels=56 * 56,
                         limit_images=2)
    row_t = {"problem": "2+2?", "answer": "4"}
    out = encode_qwen_prompt_row(row_t, Proc(), Tok(), mcfg, rcfg)
    assert "vision_batch" not in out and out["ground_truth"] == "4"

    rng = np.random.default_rng(0)
    imgs = [Image.fromarray(rng.integers(0, 255, (56, 56, 3),
                                         dtype=np.uint8))
            for _ in range(3)]  # 3 images, limit 2
    row_m = {"prompt": "what?", "images": imgs, "answer": "x"}
    out = encode_qwen_prompt_row(row_m, Proc(), Tok(), mcfg, rcfg)
    vb = out["vision_batch"]
    assert vb["patches"].dtype == np.uint8
    n_pad = int((out["input_ids"] == PAD).sum())
    n_tok = int((out["slot_map"] >= 0).sum())
    assert n_pad == n_tok > 0
    assert out["positions"].shape == (3, len(out["input_ids"]))
    # limit_images applied: exactly 2 images' merged tokens, all indices
    # inside the embedding table
    assert n_tok == vb["reverse_index"].shape[0]
    assert int(out["slot_map"].max()) == n_tok - 1
