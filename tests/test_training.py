"""Contrastive training: loss semantics, GradCache equivalence, sharded train
step on the 8-device mesh, checkpoint roundtrip + GC."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visrag_tpu.config import MeshConfig, TrainConfig
from visrag_tpu.mesh import build_mesh
from visrag_tpu.training.contrastive import (ContrastiveConfig,
                                             contrastive_loss,
                                             direct_loss_fn,
                                             gradcache_grad_fn,
                                             stack_micro_batches)
from visrag_tpu.training.trainer import RetrieverTrainer, make_optimizer


def _toy_encoder():
    """Tiny deterministic encoder: params = {'w': (F, D)}; batch = {'x': (B,F)}.
    rng participates via dropout-like noise to test PRNG replay."""
    def encode(params, batch, rng):
        h = jnp.tanh(batch["x"] @ params["w"])
        noise = jax.random.normal(rng, h.shape) * params.get("noise_scale", 0.0)
        h = h + noise
        return h / jnp.linalg.norm(h, axis=-1, keepdims=True)
    return encode


def test_contrastive_loss_matches_torch_ce():
    import torch
    rng = np.random.default_rng(0)
    q = rng.normal(size=(6, 8)).astype(np.float32)
    p = rng.normal(size=(12, 8)).astype(np.float32)  # n_passages=2
    cfg = ContrastiveConfig(temperature=0.02, n_passages=2)
    loss, metrics = contrastive_loss(jnp.asarray(q), jnp.asarray(p), cfg)
    scores = torch.tensor(q @ p.T / 0.02)
    target = torch.arange(6) * 2
    want = torch.nn.functional.cross_entropy(scores, target).item()
    assert float(loss) == pytest.approx(want, rel=1e-5)
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_gradcache_equals_direct():
    """GradCache two-pass grads == direct full-batch grads (incl. rng replay)."""
    encode = _toy_encoder()
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)),
              "noise_scale": jnp.float32(0.1)}
    q = {"x": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))}
    p = {"x": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))}
    cfg = ContrastiveConfig(temperature=0.1, n_passages=1)
    key = jax.random.PRNGKey(42)

    gc_fn = gradcache_grad_fn(encode, cfg, num_micro=4)
    (loss_gc, m_gc), grads_gc = gc_fn(params,
                                      stack_micro_batches(q, 4),
                                      stack_micro_batches(p, 4), key)

    # direct equivalent with the same per-micro rng schedule
    def direct(params):
        rngs = jax.random.split(key, 8).reshape(4, 2, -1)
        q_r = jnp.concatenate([encode(params, {"x": q["x"][i*2:(i+1)*2]},
                                      rngs[i, 0]) for i in range(4)])
        p_r = jnp.concatenate([encode(params, {"x": p["x"][i*2:(i+1)*2]},
                                      rngs[i, 1]) for i in range(4)])
        return contrastive_loss(q_r, p_r, cfg)

    (loss_d, _), grads_d = jax.value_and_grad(direct, has_aux=True)(params)
    assert float(loss_gc) == pytest.approx(float(loss_d), rel=1e-5)
    for k in grads_d:
        np.testing.assert_allclose(np.asarray(grads_gc[k]),
                                   np.asarray(grads_d[k]), rtol=1e-4, atol=1e-5)


def test_trainer_learns_on_mesh():
    """End-to-end: 8-device mesh, loss decreases, accuracy rises on a
    learnable toy task (match query rows to passage rows)."""
    mesh = build_mesh(MeshConfig(data=8))
    encode = _toy_encoder()
    rng = np.random.default_rng(2)
    params = {"w": jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32) * 0.1),
              "noise_scale": jnp.float32(0.0)}
    cfg = TrainConfig(lr=1e-2, softmax_temperature=0.05, n_passages=1,
                      log_every=5, grad_clip=1.0)
    trainer = RetrieverTrainer(encode, params, cfg, mesh=mesh, total_steps=60)

    base = rng.normal(size=(64, 16)).astype(np.float32)

    def batches():
        for _ in range(60):
            idx = rng.choice(64, size=16, replace=False)
            q = base[idx] + rng.normal(size=(16, 16)).astype(np.float32) * 0.05
            p = base[idx] + rng.normal(size=(16, 16)).astype(np.float32) * 0.05
            yield {"x": q}, {"x": p}

    hist = trainer.train(batches())
    first, last = hist[0][1], hist[-1][1]
    assert last["loss"] < first["loss"]
    assert last["accuracy"] >= 0.9


def test_checkpoint_roundtrip_and_gc(tmp_path):
    from visrag_tpu.training.checkpoint import (find_latest_ckpt,
                                                gc_checkpoints,
                                                load_checkpoint,
                                                save_checkpoint)
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    root = str(tmp_path / "ckpt")
    for step, metric in [(10, 0.5), (20, 0.9), (30, 0.7), (40, 0.6)]:
        save_checkpoint(root, step, tree, extra={"batches_seen": step},
                        best_metric=metric, save_limit=2)
    latest = find_latest_ckpt(root)
    assert latest.endswith("global_step_40")
    restored, extra = load_checkpoint(latest)
    np.testing.assert_array_equal(np.asarray(restored["w"]), tree["w"])
    assert extra == {"batches_seen": 40}
    import os
    kept = sorted(os.listdir(root))
    # keep latest 2 + best (step 20)
    assert "global_step_20" in kept and "global_step_10" not in kept


def test_sft_step():
    """SFT: loss on response tokens only; vision tower frozen."""
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.training.sft import SFTConfig, make_sft_step, sft_loss

    ref, _ = _hf_tiny()
    params = convert_qwen25_vl({k: v for k, v in ref.state_dict().items()})
    model = Qwen25VL(Qwen25VLConfig.tiny())

    def apply(p, ids, **kw):
        return model.apply({"params": p}, ids, **{k: v for k, v in kw.items()
                                                  if v is not None})

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 100, size=(2, 12)))
    rmask = np.zeros((2, 12), np.int32)
    rmask[:, 6:] = 1
    batch = {"input_ids": ids, "attention_mask": jnp.ones((2, 12), jnp.int32),
             "response_mask": jnp.asarray(rmask)}
    cfg = SFTConfig(lr=1e-3, total_steps=3, freeze_vision_tower=True)
    tx, step = make_sft_step(apply, cfg)
    import optax
    opt_state = tx.init(params)
    loss0, m0 = sft_loss(apply, params, batch)
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, batch)
    loss1, _ = sft_loss(apply, params, batch)
    assert float(loss1) < float(loss0)   # memorizes the batch
    # vision tower unchanged under freeze
    before = convert_qwen25_vl({k: v for k, v in ref.state_dict().items()})
    for leaf_b, leaf_a in zip(
            jax.tree_util.tree_leaves(before["visual"]),
            jax.tree_util.tree_leaves(params["visual"])):
        np.testing.assert_array_equal(np.asarray(leaf_b), np.asarray(leaf_a))


def test_sft_freeze_survives_weight_decay():
    """Decoupled weight decay must not shrink the frozen tower: grad
    zeroing alone lets adamw's add_decayed_weights move zero-grad params;
    the freeze must mask the optimizer itself."""
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.training.sft import SFTConfig, make_sft_step

    ref, _ = _hf_tiny()
    params = convert_qwen25_vl({k: v for k, v in ref.state_dict().items()})
    model = Qwen25VL(Qwen25VLConfig.tiny())

    def apply(p, ids, **kw):
        return model.apply({"params": p}, ids, **{k: v for k, v in kw.items()
                                                  if v is not None})

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 100, size=(2, 12)))
    rmask = np.zeros((2, 12), np.int32)
    rmask[:, 6:] = 1
    batch = {"input_ids": ids, "attention_mask": jnp.ones((2, 12), jnp.int32),
             "response_mask": jnp.asarray(rmask)}
    cfg = SFTConfig(lr=1e-2, weight_decay=0.5, total_steps=2,
                    freeze_vision_tower=True)
    tx, step = make_sft_step(apply, cfg)
    opt_state = tx.init(params)
    for _ in range(2):
        params, opt_state, _ = step(params, opt_state, batch)
    before = convert_qwen25_vl({k: v for k, v in ref.state_dict().items()})
    for leaf_b, leaf_a in zip(
            jax.tree_util.tree_leaves(before["visual"]),
            jax.tree_util.tree_leaves(params["visual"])):
        np.testing.assert_array_equal(np.asarray(leaf_b), np.asarray(leaf_a))
    # non-frozen params DID move (decay + grads)
    moved = any((np.asarray(a) != np.asarray(b)).any() for a, b in zip(
        jax.tree_util.tree_leaves(params["model"]),
        jax.tree_util.tree_leaves(before["model"])))
    assert moved


def test_sft_step_sp_matches_single():
    """SFT with ulysses_size=4 on a (data=2, seq=4) mesh == the plain
    single-device step (SP reachable from SFTConfig, VERDICT #4)."""
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.training.sft import SFTConfig, make_sft_step

    ref, _ = _hf_tiny()
    base = convert_qwen25_vl({k: v for k, v in ref.state_dict().items()})
    model = Qwen25VL(Qwen25VLConfig.tiny())
    rng = np.random.default_rng(3)
    bs, S = 4, 16
    ids = rng.integers(1, 100, size=(bs, S)).astype(np.int32)
    rm = np.zeros((bs, S), np.int32)
    rm[:, 6:12] = 1
    batch = {"input_ids": jnp.asarray(ids),
             "attention_mask": jnp.ones((bs, S), jnp.int32),
             "response_mask": jnp.asarray(rm)}
    outs = []
    for mesh, sp in ((None, 1), (build_mesh(MeshConfig(data=2, seq=4)), 4)):
        cfg = SFTConfig(lr=1e-3, warmup_steps=1, ulysses_size=sp)
        params = {"params": jax.tree_util.tree_map(
            lambda x: jnp.array(np.asarray(x)), base)}
        tx, step = make_sft_step(model.apply, cfg, mesh=mesh)
        opt_state = tx.init(params)
        params, opt_state, m = step(params, opt_state, batch)
        assert np.isfinite(float(m["loss"]))
        outs.append([np.asarray(x) for x in jax.tree_util.tree_leaves(params)])
    for a, b in zip(*outs):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_ocr_merge():
    from visrag_tpu.preprocess.ocr import merge_adjacent
    dets = [(0, 0, 10, 10, "hello"), (12, 1, 20, 11, "world"),
            (0, 20, 10, 30, "second"), (11, 21, 25, 31, "line")]
    lines = merge_adjacent(dets)
    assert lines == ["hello world", "second line"]


def test_lora_adapters():
    """LoRA (reference dense_retrieval_model.py:327-345): q/v kernels only,
    identity at init, base frozen during training, merge math exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from visrag_tpu.models.minicpm import MiniCPMConfig, MiniCPMModel
    from visrag_tpu.training.lora import (lora_init, lora_merge,
                                          lora_param_count,
                                          wrap_encode_with_lora)

    cfg = MiniCPMConfig.tiny()
    model = MiniCPMModel(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 50, (2, 8)),
                      jnp.int32)
    base = model.init(jax.random.PRNGKey(0), ids)["params"]
    lora = lora_init(jax.random.PRNGKey(1), base, rank=4)

    # only q_proj/v_proj adapted, shapes (4, in)/(out, 4)
    flat = jax.tree_util.tree_flatten_with_path(lora)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert all("q_proj" in n or "v_proj" in n for n in names)
    assert any("lora_a" in n for n in names) and any("lora_b" in n
                                                     for n in names)

    # identity at init (B = 0)
    merged0 = lora_merge(base, lora, rank=4)
    h0 = model.apply({"params": base}, ids)
    h1 = model.apply({"params": merged0}, ids)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1))

    # gradients flow to the adapters; base stays frozen by construction
    def encode(p, batch, rng):
        return model.apply({"params": p}, batch).mean(axis=1)

    enc = wrap_encode_with_lora(encode, base, rank=4, alpha=8.0)

    def loss_fn(lt):
        return jnp.sum(enc(lt, ids, None) ** 2)

    grads = jax.grad(loss_fn)(lora)
    gnorm = optax.global_norm(grads)
    assert float(gnorm) > 0
    assert lora_param_count(lora) < sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(base)) / 10

    # merge math: effective weight == base + (alpha/r)·B@A
    lora2 = jax.tree_util.tree_map(lambda x: x + 0.1, lora)
    merged = lora_merge(base, lora2, rank=4, alpha=8.0)
    # spot-check one adapted kernel numerically
    def find_first(tree, lt, base_t):
        for k in lt:
            if isinstance(lt[k], dict):
                r = find_first(tree, lt[k], base_t[k])
                if r is not None:
                    return r
            elif k == "lora_a":
                return base_t, lt
        return None
    bsub, lsub = find_first(None, lora2, base)
    want = np.asarray(bsub["weight"]) + 2.0 * np.asarray(
        lsub["lora_b"] @ lsub["lora_a"])
    def find_merged(mt, lt):
        for k in lt:
            if isinstance(lt[k], dict):
                r = find_merged(mt[k], lt[k])
                if r is not None:
                    return r
            elif k == "lora_a":
                return mt["weight"]
        return None
    got = np.asarray(find_merged(merged, lora2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_sft_sharded_matches_single():
    """FSDP-sharded SFT step (ZeRO-3 role) == single-device step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import sys
    sys.path.insert(0, ".")
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh, shard_params_fsdp
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.training.sft import SFTConfig, make_sft_step

    ref, _ = _hf_tiny()
    base = convert_qwen25_vl({k: v for k, v in ref.state_dict().items()})
    model = Qwen25VL(Qwen25VLConfig.tiny())
    rng = np.random.default_rng(0)
    bs, S = 8, 16
    ids = rng.integers(1, 100, size=(bs, S)).astype(np.int32)
    rm = np.zeros((bs, S), np.int32)
    rm[:, 6:12] = 1
    batch = {"input_ids": jnp.asarray(ids),
             "attention_mask": jnp.ones((bs, S), jnp.int32),
             "response_mask": jnp.asarray(rm),
             "positions": jnp.asarray(
                 np.broadcast_to(np.arange(S), (3, bs, S)).astype(np.int32))}
    cfg = SFTConfig(lr=1e-3, warmup_steps=1, freeze_vision_tower=True)
    outs = []
    for mesh in (None, build_mesh(MeshConfig(data=8))):
        params = {"params": jax.tree_util.tree_map(
            lambda x: jnp.array(np.asarray(x)), base)}
        if mesh is not None:
            params = {"params": shard_params_fsdp(params["params"], mesh)}
        tx, step = make_sft_step(model.apply, cfg)
        opt_state = tx.init(params)
        params, opt_state, m = step(params, opt_state, batch)
        assert np.isfinite(float(m["loss"]))
        outs.append([np.asarray(x) for x in
                     jax.tree_util.tree_leaves(params)])
    for a, b in zip(*outs):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_remat_mlp_matches_full_remat():
    """remat='mlp' (selective: attention saved, MLP recomputed) produces
    the same grads as whole-block remat and no remat — on the ViT and the
    MiniCPM LM (params keep their names: transplant trees load unchanged)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from visrag_tpu.models.minicpm import MiniCPMConfig, MiniCPMModel
    from visrag_tpu.models.siglip_vit import SiglipViT, SiglipViTConfig

    rng = np.random.default_rng(9)
    # ViT
    mk = lambda r: SiglipViTConfig.tiny(embed_dim=32, depth=2, num_heads=2,
                                        mlp_dim=64, pos_grid=4, patch_size=2,
                                        dtype=jnp.float32, remat=r)
    patches = jnp.asarray(rng.normal(size=(2, 16, 12)), jnp.float32)
    mask = jnp.ones((2, 16), jnp.int32)
    pos = jnp.asarray(rng.normal(size=(2, 16, 16)) * 0.1, jnp.float32)
    params = SiglipViT(mk(False)).init(jax.random.PRNGKey(0), patches, mask,
                                       pos)
    grads = []
    for r in (False, True, "mlp"):
        g = jax.grad(lambda p: jnp.sum(
            SiglipViT(mk(r)).apply(p, patches, mask, pos) ** 2))(params)
        grads.append(jax.tree_util.tree_leaves(g))
    for a, b, c in zip(*grads):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5,
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=2e-5,
                                   atol=2e-6)

    # MiniCPM LM
    mkl = lambda r: MiniCPMConfig.tiny(remat=r)
    ids = jnp.asarray(rng.integers(1, 255, size=(2, 16)), jnp.int32)
    lp = MiniCPMModel(mkl(False)).init(jax.random.PRNGKey(1), ids)
    lgrads = []
    for r in (False, True, "mlp"):
        g = jax.grad(lambda p: jnp.sum(
            MiniCPMModel(mkl(r)).apply(p, ids) ** 2))(lp)
        lgrads.append(jax.tree_util.tree_leaves(g))
    for a, b, c in zip(*lgrads):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5,
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=2e-5,
                                   atol=2e-6)
