"""MiniCPM-V 2.6 composite: multi-image batching, engine generation, and
weight-transplant parity of both towers against in-library HF modules
(Qwen2ForCausalLM for the LM, SiglipVisionModel for the vpm — the composite
glue itself has no offline oracle; the reference loads 2.6 via HF remote
code, visrag_scripts/generate/generate.py:243-267)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from visrag_tpu.models.minicpmv26 import (MiniCPMV26Config,
                                          MiniCPMV26ForGeneration)
from visrag_tpu.preprocess.pipeline import (PipelineConfig,
                                            build_multi_image_batch)
from visrag_tpu.preprocess.tokenize import MockTokenizer


def _pcfg(cfg):
    return PipelineConfig(seq_len=512, query_num=cfg.query_num,
                          patch_size=cfg.vit.patch_size,
                          src_grid=cfg.vit.pos_grid,
                          scale_resolution=8, max_patches=64)


def _chatml(phs, q="what does image 1 show?"):
    return ("<|im_start|>user\n" + "\n".join(phs) + "\n" + q +
            "<|im_end|>\n<|im_start|>assistant\n")


def test_multi_image_forward():
    """Two images in one prompt: slot-map regions (both <image> and <slice>
    wrappers) equal the packed slice count; logits finite; vision tokens
    actually perturb the logits."""
    cfg = MiniCPMV26Config.tiny()
    model = MiniCPMV26ForGeneration(cfg)
    tok = MockTokenizer()
    rng = np.random.default_rng(0)
    imgs = [Image.fromarray(rng.integers(0, 255, (40, 30, 3), dtype=np.uint8)),
            Image.fromarray(rng.integers(0, 255, (24, 64, 3), dtype=np.uint8))]
    b = build_multi_image_batch(tok, imgs, _chatml, _pcfg(cfg))

    n_slices = int(b["patch_mask"].any(axis=1).sum())
    n_regions = int((b["slot_map"] >= 0).sum()) // cfg.query_num
    assert n_regions == n_slices > 2          # source + slices, both images
    assert "<image_id>0</image_id>" in _chatml(["<image_id>0</image_id>x"])

    vb = {k: jnp.asarray(b[k]) for k in
          ("patches", "patch_mask", "pos_matrix", "grid_h", "grid_w")}
    ids = jnp.asarray(b["input_ids"])
    sm = jnp.asarray(b["slot_map"])
    params = model.init(jax.random.PRNGKey(0), ids, vision_batch=vb,
                        slot_map=sm)
    logits, _ = model.apply(params, ids, vision_batch=vb, slot_map=sm)
    assert bool(jnp.isfinite(logits).all())
    text_logits, _ = model.apply(params, ids)
    assert not np.allclose(np.asarray(logits), np.asarray(text_logits))


def test_single_image_no_image_id():
    tok = MockTokenizer()
    cfg = MiniCPMV26Config.tiny()
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (40, 30, 3), dtype=np.uint8))
    seen = {}
    b = build_multi_image_batch(tok, [img],
                                lambda phs: seen.setdefault("p", phs[0]),
                                _pcfg(cfg))
    assert "<image_id>" not in seen["p"]
    assert b["input_ids"].shape[0] == 1


def test_engine_generation_golden():
    """Greedy engine output == step-by-step full-forward argmax oracle."""
    from visrag_tpu.serving.engine import Engine
    from visrag_tpu.serving.sampling import SamplingParams

    cfg = MiniCPMV26Config.tiny()
    model = MiniCPMV26ForGeneration(cfg)
    tok = MockTokenizer()
    rng = np.random.default_rng(2)
    img = Image.fromarray(rng.integers(0, 255, (40, 30, 3), dtype=np.uint8))
    b = build_multi_image_batch(tok, [img], _chatml, _pcfg(cfg))
    s = int(b["attention_mask"][0].sum())
    ids = b["input_ids"][0, :s]
    vb = {k: jnp.asarray(b[k]) for k in
          ("patches", "patch_mask", "pos_matrix", "grid_h", "grid_w")}
    sm = b["slot_map"][0, :s]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids[None]),
                        vision_batch=vb, slot_map=jnp.asarray(sm[None]))

    n_new = 6
    engine = Engine(model, params, num_slots=2, max_len=512,
                    prompt_buckets=(256, 512), eos_token_ids=[])
    out = engine.generate([dict(input_ids=ids, vision_batch=vb,
                                slot_map=sm)],
                          sampling=SamplingParams(temperature=0.0,
                                                  max_tokens=n_new))[0]

    # oracle: append argmax tokens one at a time through the full forward
    cur = list(ids)
    want = []
    for _ in range(n_new):
        row = np.asarray(cur, np.int32)[None]
        smx = np.full((1, len(cur)), -1, np.int32)
        smx[0, :s] = sm
        logits, _ = model.apply(params, jnp.asarray(row), vision_batch=vb,
                                slot_map=jnp.asarray(smx))
        nxt = int(np.asarray(logits)[0, -1].argmax())
        want.append(nxt)
        cur.append(nxt)
    assert out == want


def test_llm_transplant_parity_vs_hf_qwen2():
    """Random HF Qwen2ForCausalLM → convert_minicpmv26 → text-only logits
    match HF exactly (fp32)."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from visrag_tpu.models.hf_loader import convert_minicpmv26
    from visrag_tpu.models.qwen25_vl import QwenTextConfig

    hf_cfg = Qwen2Config(vocab_size=512, hidden_size=48, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, rope_theta=1e6,
                         max_position_embeddings=512,
                         tie_word_embeddings=False, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    ids = np.array([[5, 9, 200, 31, 77, 3, 410, 12]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    state = {"llm." + k: v for k, v in hf.state_dict().items()}
    params = convert_minicpmv26(state)

    cfg = MiniCPMV26Config.tiny(
        llm=QwenTextConfig.tiny(vocab_size=512, hidden_size=48,
                                intermediate_size=96, num_hidden_layers=2,
                                num_attention_heads=4, num_key_value_heads=2,
                                rope_theta=1e6, tie_word_embeddings=False))
    model = MiniCPMV26ForGeneration(cfg)
    ref = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    # graft converted leaves over the init tree (vision params stay random)
    merged = jax.tree_util.tree_map(lambda x: x, ref)
    merged["model"] = params["model"]
    merged["lm_head"] = params["lm_head"]
    got, _ = model.apply({"params": merged}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_vpm_transplant_parity_vs_hf_siglip_vision():
    """Random HF SiglipVisionModel (gelu_pytorch_tanh) →
    convert_siglip_vision_hf → SiglipViT(act='tanh') matches on a full
    native-grid image (identity pos resample)."""
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel
    from visrag_tpu.models.hf_loader import convert_siglip_vision_hf
    from visrag_tpu.models.siglip_vit import SiglipViT, SiglipViTConfig
    from visrag_tpu.preprocess.transform import patchify

    G, PS, E = 4, 2, 32
    hf_cfg = SiglipVisionConfig(hidden_size=E, intermediate_size=64,
                                num_hidden_layers=2, num_attention_heads=2,
                                image_size=G * PS, patch_size=PS,
                                num_channels=3,
                                hidden_act="gelu_pytorch_tanh")
    torch.manual_seed(1)
    hf = SiglipVisionModel(hf_cfg).eval()
    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, 3, G * PS, G * PS)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(img)).last_hidden_state.numpy()

    params = convert_siglip_vision_hf(hf.state_dict(), prefix="")
    cfg = SiglipViTConfig(patch_size=PS, embed_dim=E, depth=2, num_heads=2,
                          mlp_dim=64, pos_grid=G, dtype=jnp.float32,
                          act="tanh")
    model = SiglipViT(cfg)
    patches, mask, (gh, gw) = patchify(img[0], PS, max_patches=G * G)
    pos_mat = np.eye(G * G, dtype=np.float32)
    got = model.apply({"params": params}, jnp.asarray(patches[None]),
                      jnp.asarray(mask[None]), jnp.asarray(pos_mat[None]))
    np.testing.assert_allclose(np.asarray(got)[0], want[0],
                               rtol=2e-4, atol=2e-4)


def test_minicpm_text_engine_golden():
    """Text-only MiniCPM generation wrapper (the 'MiniCPM' OCR-text baseline
    backend): greedy engine output == step-by-step forward argmax."""
    from visrag_tpu.models.minicpm import (MiniCPMForGeneration,
                                           MiniCPMGenConfig)
    from visrag_tpu.serving.engine import Engine
    from visrag_tpu.serving.sampling import SamplingParams

    cfg = MiniCPMGenConfig.tiny()
    model = MiniCPMForGeneration(cfg)
    ids = np.arange(10, dtype=np.int32) % 100
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids[None]))
    engine = Engine(model, params, num_slots=2, max_len=256,
                    prompt_buckets=(64, 256), eos_token_ids=[])
    out = engine.generate([dict(input_ids=ids)],
                          sampling=SamplingParams(temperature=0.0,
                                                  max_tokens=5))[0]
    cur = list(ids)
    want = []
    for _ in range(5):
        logits, _ = model.apply(params,
                                jnp.asarray(np.asarray(cur, np.int32)[None]))
        nxt = int(np.asarray(logits)[0, -1].argmax())
        want.append(nxt)
        cur.append(nxt)
    assert out == want


def test_engine_tp_matches_single_device_26():
    """MiniCPM-V 2.6 is the family that REQUIRES serving TP (8.1B bf16 >
    one 16 GB v5e): a MeshConfig(model=2) engine with a vision prompt is
    token-identical to the single-device engine."""
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh
    from visrag_tpu.serving.engine import Engine
    from visrag_tpu.serving.sampling import SamplingParams

    cfg = MiniCPMV26Config.tiny()
    model = MiniCPMV26ForGeneration(cfg)
    tok = MockTokenizer()
    rng = np.random.default_rng(5)
    img = Image.fromarray(rng.integers(0, 255, (40, 30, 3), dtype=np.uint8))
    b = build_multi_image_batch(tok, [img], _chatml, _pcfg(cfg))
    s = int(b["attention_mask"][0].sum())
    vb = {k: jnp.asarray(b[k]) for k in
          ("patches", "patch_mask", "pos_matrix", "grid_h", "grid_w")}
    sm = b["slot_map"][0, :s]
    ids = b["input_ids"][0, :s]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids[None]),
                        vision_batch=vb, slot_map=jnp.asarray(sm[None]))
    reqs = [dict(input_ids=ids, vision_batch=vb, slot_map=sm)]
    sp = SamplingParams(temperature=0.0, max_tokens=5)

    eng1 = Engine(model, params, num_slots=2, max_len=512,
                  prompt_buckets=(256, 512), eos_token_ids=[])
    want = eng1.generate(reqs, sampling=sp, rng=jax.random.PRNGKey(7))

    mesh = build_mesh(MeshConfig(model=2, data=1), devices=jax.devices()[:2])
    eng2 = Engine(model, params, num_slots=2, max_len=512,
                  prompt_buckets=(256, 512), eos_token_ids=[], mesh=mesh)
    got = eng2.generate(reqs, sampling=sp, rng=jax.random.PRNGKey(7))
    assert got == want


def test_device_mode_vision_matches_host():
    """Raw uint8 device-mode batch (pixels + in-jit pos operators) produces
    the same logits as the host-built fp32 patches + dense pos matrices."""
    cfg = MiniCPMV26Config.tiny()
    model = MiniCPMV26ForGeneration(cfg)
    tok = MockTokenizer()
    rng = np.random.default_rng(6)
    img = Image.fromarray(rng.integers(0, 255, (40, 30, 3), dtype=np.uint8))

    bh = build_multi_image_batch(tok, [img], _chatml, _pcfg(cfg))
    bd = build_multi_image_batch(tok, [img], _chatml, _pcfg(cfg),
                                 device_mode=True)
    assert "pixels" in bd and "pos_matrix" not in bd

    ids = jnp.asarray(bh["input_ids"])
    sm = jnp.asarray(bh["slot_map"])
    vh = {k: jnp.asarray(bh[k]) for k in
          ("patches", "patch_mask", "pos_matrix", "grid_h", "grid_w")}
    vd = {k: jnp.asarray(bd[k]) for k in
          ("pixels", "patch_mask", "grid_h", "grid_w")}
    params = model.init(jax.random.PRNGKey(0), ids, vision_batch=vh,
                        slot_map=sm)
    want, _ = model.apply(params, ids, vision_batch=vh, slot_map=sm)
    got, _ = model.apply(params, ids, vision_batch=vd, slot_map=sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_engine_mixed_vision_text_batching():
    """A queue mixing vision and text prompts: the batched-prefill selector
    skips vision rows (they prefill singly) and every request still gets
    its correct greedy output."""
    from visrag_tpu.serving.engine import Engine
    from visrag_tpu.serving.sampling import SamplingParams

    cfg = MiniCPMV26Config.tiny()
    model = MiniCPMV26ForGeneration(cfg)
    tok = MockTokenizer()
    rng = np.random.default_rng(9)
    img = Image.fromarray(rng.integers(0, 255, (40, 30, 3), dtype=np.uint8))
    b = build_multi_image_batch(tok, [img], _chatml, _pcfg(cfg))
    s = int(b["attention_mask"][0].sum())
    vb = {k: jnp.asarray(b[k]) for k in
          ("patches", "patch_mask", "pos_matrix", "grid_h", "grid_w")}
    vreq = dict(input_ids=b["input_ids"][0, :s], vision_batch=vb,
                slot_map=b["slot_map"][0, :s])
    treqs = [dict(input_ids=rng.integers(0, 100, size=(n,))
                  .astype(np.int32)) for n in (7, 5, 9)]
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(vreq["input_ids"][None]),
                        vision_batch=vb,
                        slot_map=jnp.asarray(vreq["slot_map"][None]))
    sp = SamplingParams(temperature=0.0, max_tokens=4)

    eng1 = Engine(model, params, num_slots=1, max_len=512,
                  prompt_buckets=(256, 512), eos_token_ids=[])
    want = [eng1.generate([r], sampling=sp)[0]
            for r in [treqs[0], vreq, treqs[1], treqs[2]]]

    eng = Engine(model, params, num_slots=8, max_len=512,
                 prompt_buckets=(256, 512), eos_token_ids=[])
    got = eng.generate([treqs[0], vreq, treqs[1], treqs[2]], sampling=sp)
    assert got == want
    # 3 text prompts batch (K=2 + 1 leftover batched later or single);
    # the vision prompt always prefills alone
    assert eng.prefill_count == 4 and eng.prefill_dispatches < 4


def test_engine_vision_group_leader_not_bypassed():
    """A vision prompt with n>1 queued behind a text prompt: the batched
    selector must NOT full-prefill a vision-stripped sibling (which would
    publish garbage group state and skip the vision tower). All n outputs
    must equal the unbatched engine's vision outputs."""
    from visrag_tpu.serving.engine import Engine
    from visrag_tpu.serving.sampling import SamplingParams

    cfg = MiniCPMV26Config.tiny()
    model = MiniCPMV26ForGeneration(cfg)
    tok = MockTokenizer()
    rng = np.random.default_rng(13)
    img = Image.fromarray(rng.integers(0, 255, (40, 30, 3), dtype=np.uint8))
    b = build_multi_image_batch(tok, [img], _chatml, _pcfg(cfg))
    s = int(b["attention_mask"][0].sum())
    vb = {k: jnp.asarray(b[k]) for k in
          ("patches", "patch_mask", "pos_matrix", "grid_h", "grid_w")}
    vreq = dict(input_ids=b["input_ids"][0, :s], vision_batch=vb,
                slot_map=b["slot_map"][0, :s])
    treq = dict(input_ids=rng.integers(0, 100, size=(7,)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(vreq["input_ids"][None]),
                        vision_batch=vb,
                        slot_map=jnp.asarray(vreq["slot_map"][None]))
    sp = SamplingParams(temperature=0.0, max_tokens=4)

    ref = Engine(model, params, num_slots=1, max_len=512,
                 prompt_buckets=(256, 512), eos_token_ids=[])
    want_v = ref.generate([vreq], sampling=sp)[0]
    want_t = ref.generate([treq], sampling=sp)[0]

    eng = Engine(model, params, num_slots=8, max_len=512,
                 prompt_buckets=(256, 512), eos_token_ids=[])
    ids_t = eng.add_request(**treq, sampling=sp)
    ids_v = eng.add_request(**vreq, sampling=sp, n=4)
    results = eng.run()
    assert results[ids_t] == want_t
    for rid in ids_v:
        assert results[rid] == want_v
    assert eng.prefill_count == 2            # text + one vision leader
