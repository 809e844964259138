"""SigLIP bi-tower parity vs HF SiglipModel (tiny random config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visrag_tpu.models.siglip import SiglipConfig, SiglipModel
from visrag_tpu.models.hf_loader import convert_siglip


@pytest.fixture(scope="module")
def hf_siglip():
    import torch
    from transformers import SiglipConfig as HFCfg
    from transformers.models.siglip.modeling_siglip import SiglipModel as HFModel

    cfg = HFCfg(
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         vocab_size=128, max_position_embeddings=16),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=16, patch_size=4),
        attn_implementation="eager")
    torch.manual_seed(0)
    return HFModel(cfg).eval()


def test_siglip_parity(hf_siglip):
    import torch
    ref = hf_siglip
    params = convert_siglip({k: v for k, v in ref.state_dict().items()})
    cfg = SiglipConfig.tiny()
    model = SiglipModel(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 16))
    imgs = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)

    with torch.no_grad():
        t_out = ref.text_model(input_ids=torch.tensor(ids))
        v_out = ref.vision_model(pixel_values=torch.tensor(imgs))
        want_t = t_out.pooler_output.numpy()
        want_v = v_out.pooler_output.numpy()

    # patchify NCHW images row-major with (c, ph, pw) layout
    ps = cfg.patch_size
    p = imgs.reshape(2, 3, 4, ps, 4, ps).transpose(0, 2, 4, 1, 3, 5)
    patches = p.reshape(2, 16, 3 * ps * ps)

    got_t, got_v = model.apply({"params": params}, jnp.asarray(ids),
                               jnp.asarray(patches))
    np.testing.assert_allclose(np.asarray(got_t), want_t, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_v), want_v, rtol=3e-4, atol=3e-4)


def test_siglip_retrieval_roundtrip():
    """siglip_pooling retrieval: text and image embeddings live in one space
    (random weights: just shapes + finite + distinct)."""
    cfg = SiglipConfig.tiny()
    model = SiglipModel(cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 128, size=(3, 16)))
    patches = jnp.asarray(rng.normal(size=(3, 16, 48)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ids, patches)
    t, v = model.apply(params, ids, patches)
    assert t.shape == (3, 32) and v.shape == (3, 32)
    assert np.isfinite(np.asarray(t)).all()
    assert not np.allclose(np.asarray(v)[0], np.asarray(v)[1])
