"""Weight-transplant parity tests: tiny random reference torch models → convert
state_dict → JAX models must reproduce outputs.

Note: the reference's `--attention bidirectional` flag writes config.is_causal
but MiniCPM attention hardcodes is_causal=True and never reads it
(modeling_minicpm.py:374; dense_retrieval_model.py:282-287) — VisRAG-Ret is
causal in practice, so parity here is tested causal.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

import jax
import jax.numpy as jnp


def _to_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def torch_ref_lm():
    import torch
    from openmatch.modeling.modeling_minicpmv.modeling_minicpm import (
        MiniCPMForCausalLM)
    from openmatch.modeling.modeling_minicpmv.configuration_minicpm import (
        MiniCPMConfig as RefCfg)

    cfg = RefCfg(vocab_size=128, hidden_size=32, intermediate_size=64,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=4, scale_emb=12, dim_model_base=16,
                 scale_depth=1.4, rms_norm_eps=1e-5,
                 attn_implementation="eager", use_cache=False)
    torch.manual_seed(0)
    model = MiniCPMForCausalLM(cfg).eval()
    return cfg, model


def test_minicpm_lm_parity(torch_ref_lm):
    import torch
    from visrag_tpu.models.minicpm import MiniCPMConfig, MiniCPMForCausalLM
    from visrag_tpu.models.hf_loader import convert_minicpm_lm

    ref_cfg, ref = torch_ref_lm
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 128, size=(2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        out = ref.model(input_ids=torch.tensor(ids),
                        attention_mask=torch.tensor(mask), use_cache=False)
        want_h = out.last_hidden_state.numpy()
        want_logits = ref(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask),
                          use_cache=False).logits.numpy()

    cfg = MiniCPMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=4, scale_emb=12, dim_model_base=16,
                        scale_depth=1.4, rms_norm_eps=1e-5, is_causal=True,
                        dtype=jnp.float32)
    model = MiniCPMForCausalLM(cfg)
    params = convert_minicpm_lm(_to_state(ref))
    logits, hidden = model.apply({"params": params}, jnp.asarray(ids),
                                 attention_mask=jnp.asarray(mask))
    got_h = np.asarray(hidden)
    # compare only valid positions (padding rows differ by design)
    m = mask.astype(bool)
    np.testing.assert_allclose(got_h[m], want_h[m], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits)[m], want_logits[m],
                               rtol=2e-3, atol=2e-3)


@pytest.fixture(scope="module")
def torch_ref_resampler():
    """Reference Resampler; torchvision stubbed (unused at runtime)."""
    import types
    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tr.Compose = lambda *a, **k: None
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    from openmatch.modeling.modeling_minicpmv.resampler import Resampler

    torch.manual_seed(1)
    model = Resampler(grid_size=2, embed_dim=16, num_heads=2, kv_dim=8,
                      adaptive=True).eval()
    return model


def test_resampler_parity(torch_ref_resampler):
    import torch
    from visrag_tpu.models.resampler import Resampler, ResamplerConfig
    from visrag_tpu.models.hf_loader import convert_resampler

    ref = torch_ref_resampler
    rng = np.random.default_rng(2)
    gh, gw = 3, 5
    n_patch = gh * gw
    x = rng.normal(size=(2, n_patch, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x), tgt_size=(gh, gw)).numpy()

    cfg = ResamplerConfig(num_queries=4, embed_dim=16, kv_dim=8, num_heads=2,
                          dtype=jnp.float32)
    model = Resampler(cfg)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_resampler(state, prefix="")
    got = model.apply(
        {"params": params}, jnp.asarray(x),
        jnp.array([gh, gh], jnp.int32), jnp.array([gw, gw], jnp.int32),
        jnp.ones((2, n_patch), jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_resampler_mask_equivalence():
    """Padded patches with mask == exact shorter input."""
    from visrag_tpu.models.resampler import Resampler, ResamplerConfig
    cfg = ResamplerConfig(num_queries=4, embed_dim=16, kv_dim=8, num_heads=2,
                          dtype=jnp.float32)
    model = Resampler(cfg)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 15, 8)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.array([3]), jnp.array([5]),
                        jnp.ones((1, 15), jnp.int32))
    full = model.apply(params, jnp.asarray(x), jnp.array([3]), jnp.array([5]),
                       jnp.ones((1, 15), jnp.int32))
    xp = np.concatenate([x, rng.normal(size=(1, 9, 8)).astype(np.float32)], 1)
    mask = np.concatenate([np.ones((1, 15)), np.zeros((1, 9))], 1).astype(np.int32)
    padded = model.apply(params, jnp.asarray(xp), jnp.array([3]),
                         jnp.array([5]), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(padded), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_siglip_vit_vs_torch_oracle():
    """ViT vs an independent torch oracle with timm block semantics
    (pre-norm, joint qkv with bias, exact GELU, LN eps 1e-6)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF
    from visrag_tpu.models.siglip_vit import SiglipViT, SiglipViTConfig
    from visrag_tpu.models.hf_loader import convert_siglip_vit

    E, H, D, P, G = 16, 2, 32, 8, 3   # embed, heads, mlp, patch_dim -> grid 3x3
    torch.manual_seed(4)

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(E, eps=1e-6)
            self.qkv = tnn.Linear(E, 3 * E)
            self.proj = tnn.Linear(E, E)
            self.norm2 = tnn.LayerNorm(E, eps=1e-6)
            self.fc1 = tnn.Linear(E, D)
            self.fc2 = tnn.Linear(D, E)

        def forward(self, x):
            n, p, _ = x.shape
            y = self.norm1(x)
            qkv = self.qkv(y).reshape(n, p, 3, H, E // H).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            o = tF.scaled_dot_product_attention(q, k, v)
            x = x + self.proj(o.transpose(1, 2).reshape(n, p, E))
            x = x + self.fc2(tF.gelu(self.fc1(self.norm2(x))))
            return x

    blocks = [Block().eval() for _ in range(2)]
    patch_w = torch.randn(E, 3, 2, 2) * 0.1
    patch_b = torch.randn(E) * 0.1
    pos = torch.randn(G * G, E) * 0.02
    final_norm = tnn.LayerNorm(E, eps=1e-6)

    rng = np.random.default_rng(5)
    img = rng.normal(size=(1, 3, 6, 6)).astype(np.float32)  # grid 3x3, ps=2
    with torch.no_grad():
        t = tF.conv2d(torch.tensor(img), patch_w, patch_b, stride=2)
        t = t.flatten(2).transpose(1, 2) + pos[None]
        for b in blocks:
            t = b(t)
        want = final_norm(t).numpy()

    # assemble a state dict in timm naming and convert
    state = {"patch_embed.proj.weight": patch_w.numpy(),
             "patch_embed.proj.bias": patch_b.numpy(),
             "pos_embed": pos.numpy()[None],
             "norm.weight": final_norm.weight.detach().numpy(),
             "norm.bias": final_norm.bias.detach().numpy()}
    for i, b in enumerate(blocks):
        state.update({
            f"blocks.{i}.norm1.weight": b.norm1.weight.detach().numpy(),
            f"blocks.{i}.norm1.bias": b.norm1.bias.detach().numpy(),
            f"blocks.{i}.attn.qkv.weight": b.qkv.weight.detach().numpy(),
            f"blocks.{i}.attn.qkv.bias": b.qkv.bias.detach().numpy(),
            f"blocks.{i}.attn.proj.weight": b.proj.weight.detach().numpy(),
            f"blocks.{i}.attn.proj.bias": b.proj.bias.detach().numpy(),
            f"blocks.{i}.norm2.weight": b.norm2.weight.detach().numpy(),
            f"blocks.{i}.norm2.bias": b.norm2.bias.detach().numpy(),
            f"blocks.{i}.mlp.fc1.weight": b.fc1.weight.detach().numpy(),
            f"blocks.{i}.mlp.fc1.bias": b.fc1.bias.detach().numpy(),
            f"blocks.{i}.mlp.fc2.weight": b.fc2.weight.detach().numpy(),
            f"blocks.{i}.mlp.fc2.bias": b.fc2.bias.detach().numpy(),
        })

    cfg = SiglipViTConfig(patch_size=2, embed_dim=E, depth=2, num_heads=H,
                          mlp_dim=D, pos_grid=G, dtype=jnp.float32)
    model = SiglipViT(cfg)
    params = convert_siglip_vit(state, prefix="", depth=2)

    # patchify host-side; identity pos matrix (native grid → no resample)
    from visrag_tpu.preprocess.transform import patchify
    patches, mask, (gh, gw) = patchify(img[0], 2, max_patches=16)
    pos_mat = np.zeros((16, G * G), np.float32)
    pos_mat[:9, :9] = np.eye(9)
    got = model.apply({"params": params}, jnp.asarray(patches[None]),
                      jnp.asarray(mask[None]), jnp.asarray(pos_mat[None]))
    np.testing.assert_allclose(np.asarray(got)[0, :9], want[0],
                               rtol=2e-4, atol=2e-4)
