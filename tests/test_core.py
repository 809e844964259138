"""Config tree, mesh construction, pooling parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visrag_tpu.config import (MeshConfig, RetrieverTrainConfig, load_config,
                               merge_dotlist, to_dict)
from visrag_tpu.mesh import build_mesh, batch_sharding, shard_params_fsdp
from visrag_tpu.ops.pooling import pool, l2_normalize


def test_config_defaults_and_dotlist():
    cfg = load_config(RetrieverTrainConfig,
                      dotlist=["train.lr=1e-5", "model.pooling=mean",
                               "mesh.data=4", "data.batch_size=8"])
    assert cfg.train.lr == 1e-5
    assert cfg.model.pooling == "mean"
    assert cfg.mesh.data == 4
    assert cfg.data.batch_size == 8
    with pytest.raises(KeyError):
        merge_dotlist(cfg, ["train.nonexistent=1"])


def test_config_yaml_roundtrip(tmp_path):
    import json
    p = tmp_path / "run.yaml"
    p.write_text("train:\n  lr: 3.0e-5\nmodel:\n  attention: bidirectional\n")
    cfg = load_config(RetrieverTrainConfig, yaml_path=str(p))
    assert cfg.train.lr == 3e-5
    assert cfg.model.attention == "bidirectional"
    json.dumps(to_dict(cfg))  # serializable


def test_mesh_shapes():
    mesh = build_mesh(MeshConfig(data=-1))
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = build_mesh(MeshConfig(data=4, model=2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_fsdp_sharding():
    mesh = build_mesh(MeshConfig(data=8))
    params = {"big": jnp.zeros((1024, 512)), "small": jnp.zeros((4, 4))}
    sharded = shard_params_fsdp(params, mesh)
    big_spec = sharded["big"].sharding.spec
    assert "data" in [a for a in big_spec if a]
    small_spec = sharded["small"].sharding.spec
    assert all(a is None for a in small_spec)


def test_wmean_pool_matches_torch_semantics():
    """wmean: weights = mask * cumsum(mask) — reference
    dense_retrieval_model.py:180-184."""
    import torch
    rng = np.random.default_rng(0)
    hidden = rng.normal(size=(3, 7, 5)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0, 0, 0],
                     [1, 1, 1, 1, 1, 1, 1],
                     [1, 1, 0, 0, 0, 0, 0]], np.int32)

    th_h, th_m = torch.tensor(hidden), torch.tensor(mask)
    am = th_m * th_m.cumsum(dim=1)
    s = torch.sum(th_h * am.unsqueeze(-1).float(), dim=1)
    d = am.sum(dim=1, keepdim=True).float()
    want = (s / d).numpy()

    got = np.asarray(pool(jnp.asarray(hidden), jnp.asarray(mask), "wmean"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["mean", "lasttoken", "cls"])
def test_other_pools(mode):
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(rng.normal(size=(2, 6, 4)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], np.int32))
    out = pool(hidden, mask, mode)
    assert out.shape == (2, 4)
    if mode == "lasttoken":
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(hidden[0, 3]))
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(hidden[1, 1]))


def test_l2_normalize():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 9)).astype(np.float32))
    n = np.linalg.norm(np.asarray(l2_normalize(x)), axis=-1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-5)


def test_batch_sharding_put():
    mesh = build_mesh(MeshConfig(data=8))
    x = jnp.zeros((16, 4))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert xs.sharding.is_fully_addressable


def test_stateful_iterator_cursor():
    """StatefulIterator: epoch/row cursor, resume at exact row, cycling."""
    from visrag_tpu.data.datasets import StatefulIterator

    it = StatefulIterator(lambda: iter(range(5)), cycle=True)
    assert [next(it) for _ in range(7)] == [0, 1, 2, 3, 4, 0, 1]
    st = it.state()
    assert st == {"epoch": 1, "row": 2}
    it2 = StatefulIterator(lambda: iter(range(5)), cycle=True)
    it2.set_state(st)
    assert [next(it2) for _ in range(4)] == [2, 3, 4, 0]
    assert it2.epoch == 2
    # non-cycling raises StopIteration at the end
    assert list(StatefulIterator(lambda: iter(range(2)))) == [0, 1]
    with pytest.raises(RuntimeError):
        next(StatefulIterator(lambda: iter(()), cycle=True))


def test_retriever_kill_resume_batch_sequence(tmp_path):
    """Kill-and-resume consumes the SAME batch sequence (and reaches the
    same params) as a never-killed run — the dataloader cursor rides in the
    checkpoint (VERDICT next-round #7; reference StatefulDataLoader,
    ray_trainer.py:332-334)."""
    import dataclasses
    from visrag_tpu.config import TrainConfig
    from visrag_tpu.data.datasets import StatefulIterator
    from visrag_tpu.training.trainer import RetrieverTrainer

    rows = list(range(11))            # odd length → batches straddle epochs

    def encode(p, batch, rng):
        del rng
        return jnp.tanh(batch @ p["w"])

    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)

    def make_batches(row_iter, seen):
        buf = []
        for r in row_iter:
            buf.append(r)
            if len(buf) == 2:
                seen.append(tuple(buf))
                arr = np.stack([np.arange(4) * 0.1 + x for x in buf]
                               ).astype(np.float32)
                yield jnp.asarray(arr), jnp.asarray(arr)
                buf = []

    cfg = TrainConfig(lr=1e-2, log_every=100, save_every=2, max_steps=4)

    def run(trainer_cfg, row_iter, seen, ckpt=None, resume=False):
        t = RetrieverTrainer(encode, {"w": jnp.asarray(w0.copy())},
                             trainer_cfg, total_steps=4)
        t.data_iter = row_iter
        if resume:
            assert t.maybe_resume(ckpt) == 2
        t.train(make_batches(row_iter, seen), checkpoint_dir=ckpt)
        return t

    # A: uninterrupted 4 steps
    seen_a, it_a = [], StatefulIterator(lambda: iter(rows), cycle=True)
    t_a = run(cfg, it_a, seen_a)
    # B: killed after 2 steps (checkpoint at step 2), resumed in a fresh
    # trainer with a fresh iterator
    seen_b, it_b = [], StatefulIterator(lambda: iter(rows), cycle=True)
    run(dataclasses.replace(cfg, max_steps=2), it_b, seen_b,
        ckpt=str(tmp_path))
    it_c = StatefulIterator(lambda: iter(rows), cycle=True)
    t_c = run(cfg, it_c, seen_b, ckpt=str(tmp_path), resume=True)

    assert seen_b == seen_a            # identical batch sequence
    np.testing.assert_allclose(np.asarray(t_c.params["w"]),
                               np.asarray(t_a.params["w"]),
                               rtol=1e-5, atol=1e-6)


def test_iter_rows_directory_shards(tmp_path):
    """Directory of numbered shards == the reference train_dataset layout
    (examples/training_data/{0.parquet, metadata.json})."""
    import json
    import pyarrow as pa
    import pyarrow.parquet as pq
    from visrag_tpu.data.datasets import dataset_length, iter_rows

    pq.write_table(pa.table({"query": ["a", "b"], "source": ["s", "s"]}),
                   tmp_path / "0.parquet")
    pq.write_table(pa.table({"query": ["c"], "source": ["s"]}),
                   tmp_path / "1.parquet")
    # 10+ shards must iterate in NUMERIC order (lexicographic puts 10 < 2)
    pq.write_table(pa.table({"query": ["d"], "source": ["s"]}),
                   tmp_path / "2.parquet")
    pq.write_table(pa.table({"query": ["e"], "source": ["s"]}),
                   tmp_path / "10.parquet")
    (tmp_path / "metadata.json").write_text(json.dumps({"length": 5}))
    rows = list(iter_rows(str(tmp_path)))
    assert [r["query"] for r in rows] == ["a", "b", "c", "d", "e"]
    assert dataset_length(str(tmp_path)) == 5


def test_mmdr_dataset_reads_reference_example():
    """The real reference example corpus loads end-to-end (real JPEG pages)."""
    import os
    path = "/root/reference/examples/training_data"
    if not os.path.isdir(path):
        pytest.skip("reference example data not present")
    from visrag_tpu.data.datasets import MMDRTrainDataset
    ds = MMDRTrainDataset(path)
    rows = list(ds)
    assert len(rows) == len(ds) == 2
    for ex in rows:
        text, img = ex["passages"][0]
        assert text == "" and img.size[0] > 100 and img.size[1] > 100
        assert ex["query"][0]
