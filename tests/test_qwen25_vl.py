"""Qwen2.5-VL parity vs the HF torch implementation (tiny random config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visrag_tpu.models.mrope import get_rope_index
from visrag_tpu.models.qwen25_vl import (Qwen25VLConfig, Qwen25VL,
                                         QwenTextConfig, QwenTextModel,
                                         QwenVisionConfig, QwenVisionTower)
from visrag_tpu.models.hf_loader import convert_qwen25_vl
from visrag_tpu.preprocess.qwen_vision import prepare_vision_batch


def _hf_tiny():
    import torch
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration)

    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=128, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rms_norm_eps=1e-6, rope_theta=1e6,
            tie_word_embeddings=True, max_position_embeddings=512,
            rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        ),
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            window_size=112, fullatt_block_indexes=[1], out_hidden_size=48,
            hidden_act="silu",
        ),
        image_token_id=120, vision_start_token_id=119, video_token_id=121,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return Qwen2_5_VLForConditionalGeneration(cfg).eval(), cfg


@pytest.fixture(scope="module")
def hf_model():
    return _hf_tiny()


def _state(model):
    return {k: v for k, v in model.state_dict().items()}


def test_text_model_parity(hf_model):
    import torch
    ref, cfg = hf_model
    params = convert_qwen25_vl(_state(ref))
    tcfg = QwenTextConfig.tiny()
    model = QwenTextModel(tcfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, size=(2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        out = ref.model.language_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask), use_cache=False)
        want = out.last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params["model"]},
                                 jnp.asarray(ids),
                                 attention_mask=jnp.asarray(mask)))
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], want[m], rtol=3e-4, atol=3e-4)


def test_vision_tower_parity(hf_model):
    import torch
    from PIL import Image
    ref, cfg = hf_model
    params = convert_qwen25_vl(_state(ref))
    vcfg = QwenVisionConfig.tiny()
    tower = QwenVisionTower(vcfg)

    rng = np.random.default_rng(1)
    imgs = [Image.fromarray(rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)),
            Image.fromarray(rng.integers(0, 255, (56, 56, 3), dtype=np.uint8))]
    vb = prepare_vision_batch(imgs, head_dim=vcfg.head_dim,
                              min_pixels=56 * 56, max_pixels=28 * 28 * 16)

    # HF expects image-order flat patches + grid_thw
    flats = []
    from visrag_tpu.preprocess.qwen_vision import image_to_patches
    for img in imgs:
        f, g = image_to_patches(img, min_pixels=56 * 56,
                                max_pixels=28 * 28 * 16)
        flats.append(f)
    pixels = torch.tensor(np.concatenate(flats, 0))
    grid = torch.tensor(np.array(vb.grid_thw), dtype=torch.long)
    with torch.no_grad():
        want = ref.model.visual(pixels, grid_thw=grid).numpy()

    got = np.asarray(tower.apply(
        {"params": params["visual"]},
        jnp.asarray(vb.patches), jnp.asarray(vb.rot_cos),
        jnp.asarray(vb.rot_sin), jnp.asarray(vb.seg_window),
        jnp.asarray(vb.seg_full), jnp.asarray(vb.reverse_index)))
    assert got.shape[0] == vb.n_tokens == want.shape[0]
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_full_model_with_images(hf_model):
    import torch
    from PIL import Image
    ref, cfg = hf_model
    params = convert_qwen25_vl(_state(ref))
    jcfg = Qwen25VLConfig.tiny()
    model = Qwen25VL(jcfg)

    rng = np.random.default_rng(2)
    img = Image.fromarray(rng.integers(0, 255, (56, 56, 3), dtype=np.uint8))
    vb = prepare_vision_batch([img], head_dim=jcfg.vision.head_dim,
                              min_pixels=56 * 56, max_pixels=28 * 28 * 16)
    n_img_tokens = vb.n_tokens
    ids = ([10, 11, jcfg.vision_start_token_id] +
           [jcfg.image_token_id] * n_img_tokens + [12, 13])
    ids = np.array([ids])
    pos = get_rope_index(ids[0], vb.grid_thw, jcfg.image_token_id)[:, None, :]

    from visrag_tpu.preprocess.qwen_vision import image_to_patches
    f, _ = image_to_patches(img, min_pixels=56 * 56, max_pixels=28 * 28 * 16)
    with torch.no_grad():
        out = ref(input_ids=torch.tensor(ids),
                  pixel_values=torch.tensor(f),
                  image_grid_thw=torch.tensor(np.array(vb.grid_thw),
                                              dtype=torch.long),
                  use_cache=False)
        want = out.logits.numpy()
        # HF computes its own mrope ids; verify ours match
        hf_pos, _ = ref.model.get_rope_index(
            torch.tensor(ids), torch.tensor(np.array(vb.grid_thw),
                                            dtype=torch.long))
        np.testing.assert_array_equal(pos, hf_pos.numpy())

    # slot map: image tokens → vision rows 0..n-1
    slot = np.full(ids.shape, -1, np.int32)
    slot[ids == jcfg.image_token_id] = np.arange(n_img_tokens)
    vision_batch = {k: jnp.asarray(getattr(vb, k)) for k in
                    ("patches", "rot_cos", "rot_sin", "seg_window",
                     "seg_full", "reverse_index")}
    logits, _ = model.apply({"params": params}, jnp.asarray(ids),
                            positions=jnp.asarray(pos),
                            vision_batch=vision_batch,
                            slot_map=jnp.asarray(slot))
    np.testing.assert_allclose(np.asarray(logits), want, rtol=5e-4, atol=5e-4)


def test_video_patches_and_forward():
    """Video (multi-frame) vision path: t>1 grids through patches, windows,
    mrope, and the full model forward."""
    import numpy as np
    from PIL import Image
    import jax.numpy as jnp
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.mrope import get_rope_index
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.preprocess.qwen_vision import (prepare_vision_batch,
                                                   video_to_patches)

    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (56, 56, 3),
                                           dtype=np.uint8))
              for _ in range(5)]  # odd count → last frame repeats
    flat, grid = video_to_patches(frames, min_pixels=16 * 16,
                                  max_pixels=56 * 56)
    assert grid[0] == 3 and flat.shape[0] == grid[0] * grid[1] * grid[2]

    cfg = Qwen25VLConfig.tiny()
    vb = prepare_vision_batch([frames], head_dim=cfg.vision.head_dim,
                              min_pixels=16 * 16, max_pixels=56 * 56)
    assert vb.grid_thw[0][0] == 3
    n_img = vb.n_tokens
    ids = np.concatenate([
        rng.integers(0, 100, size=(2,)),
        np.full((n_img,), cfg.image_token_id),
        rng.integers(0, 100, size=(3,)),
    ]).astype(np.int32)
    pos = get_rope_index(ids, vb.grid_thw, cfg.image_token_id)
    assert pos.shape == (3, len(ids))
    # temporal position ids advance across frames inside the video span
    tpos = pos[0, 2:2 + n_img]
    assert tpos.max() > tpos.min()
    slot = np.full(ids.shape, -1, np.int32)
    slot[ids == cfg.image_token_id] = np.arange(n_img)
    model = Qwen25VL(cfg)
    vision_batch = {k: jnp.asarray(getattr(vb, k)) for k in
                    ("patches", "rot_cos", "rot_sin", "seg_window",
                     "seg_full", "reverse_index")}
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids[None]),
                        vision_batch=vision_batch,
                        slot_map=jnp.asarray(slot[None]))
    logits, _ = model.apply(params, jnp.asarray(ids[None]),
                            vision_batch=vision_batch,
                            slot_map=jnp.asarray(slot[None]))
    assert np.isfinite(np.asarray(logits)).all()


def test_device_mode_vision_batch_matches_host():
    """prepare_vision_batch(device_mode=True) ships uint8 patches; the model
    normalizes in-jit — logits match the host-normalized fp32 path to fp32
    rounding (4× less host→device traffic per vision prefill)."""
    import numpy as np
    from PIL import Image
    import jax.numpy as jnp
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig

    rng = np.random.default_rng(7)
    img = Image.fromarray(rng.integers(0, 255, (56, 84, 3), dtype=np.uint8))
    cfg = Qwen25VLConfig.tiny()
    kw = dict(head_dim=cfg.vision.head_dim, min_pixels=16 * 16,
              max_pixels=56 * 84)
    vh = prepare_vision_batch([img], **kw)
    vd = prepare_vision_batch([img], device_mode=True, **kw)
    assert vd.patches.dtype == np.uint8
    np.testing.assert_array_equal(vh.rot_cos, vd.rot_cos)

    n_img = vh.n_tokens
    ids = np.concatenate([
        rng.integers(0, 100, size=(2,)),
        np.full((n_img,), cfg.image_token_id),
        rng.integers(0, 100, size=(3,)),
    ]).astype(np.int32)
    slot = np.full(ids.shape, -1, np.int32)
    slot[ids == cfg.image_token_id] = np.arange(n_img)
    model = Qwen25VL(cfg)

    def as_batch(vb):
        return {k: jnp.asarray(getattr(vb, k)) for k in
                ("patches", "rot_cos", "rot_sin", "seg_window",
                 "seg_full", "reverse_index")}

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids[None]),
                        vision_batch=as_batch(vh),
                        slot_map=jnp.asarray(slot[None]))
    want, _ = model.apply(params, jnp.asarray(ids[None]),
                          vision_batch=as_batch(vh),
                          slot_map=jnp.asarray(slot[None]))
    got, _ = model.apply(params, jnp.asarray(ids[None]),
                         vision_batch=as_batch(vd),
                         slot_map=jnp.asarray(slot[None]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_large_config_presets():
    """32B/72B presets: head_dim 128, mrope sections sum to head_dim/2,
    kvh=8 divisible by the reference's TP8 (Engine(mesh=) compatibility)."""
    from visrag_tpu.models.qwen25_vl import Qwen25VLConfig
    for cfg, layers in ((Qwen25VLConfig.b32(), 64),
                        (Qwen25VLConfig.b72(), 80)):
        t = cfg.text
        assert t.head_dim == 128
        assert sum(t.mrope_section) == t.head_dim // 2
        assert t.num_hidden_layers == layers
        assert t.num_key_value_heads == 8
        assert t.num_attention_heads % 8 == 0 and 8 % 1 == 0  # tp=8 legal
        assert t.hidden_size == cfg.vision.out_hidden_size
