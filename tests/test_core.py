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
