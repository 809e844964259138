"""FULL-composite end-to-end golden: our VisRAGRet (pipeline + ViT +
resampler + LM + wmean pooling) against the reference's composed torch
modules — the real timm SigLIP-SO400M ViT from the vendored timm_modified,
the reference MiniCPMV scatter/resampler, and the reference wmean+L2 math
(dense_retrieval_model.py:180-184,222-223) — on real page images, with
Recall rank-parity on a small corpus (BASELINE.json north star: bit-for-rank
retrieval outputs).

The LM is shrunk to 2 layers/128 hidden (transplanted weights, same scaling
constants); the vision tower is the FULL 428M-param SO400M architecture.
Images are kept small and scale_resolution=56 so the adaptive slicer
produces multi-slice pages with tiny patch counts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_oracle import install_torchvision_stub, reference_paths

QUERY_NUM = 4
SCALE_RES = 56


@pytest.fixture(scope="module")
def ref_model():
    import torch
    install_torchvision_stub()
    reference_paths()
    from openmatch.modeling.modeling_minicpmv.configuration_minicpm import (
        MiniCPMVConfig)
    from openmatch.modeling.modeling_minicpmv.modeling_minicpmv import MiniCPMV

    cfg = MiniCPMVConfig(
        vision_encoder="vit_so400m_patch14_siglip_384.webli",
        query_num=QUERY_NUM, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        vocab_size=256, scale_emb=12.0, scale_depth=1.4, dim_model_base=256,
        rms_norm_eps=1e-5, max_position_embeddings=4096)
    torch.manual_seed(0)
    model = MiniCPMV(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def our_model(ref_model):
    from visrag_tpu.models.hf_loader import convert_visrag_ret
    from visrag_tpu.models.minicpm import MiniCPMConfig
    from visrag_tpu.models.minicpmv import MiniCPMVConfig
    from visrag_tpu.models.resampler import ResamplerConfig
    from visrag_tpu.models.siglip_vit import SiglipViTConfig
    from visrag_tpu.models.visrag_ret import VisRAGRet, VisRAGRetConfig

    cfg = VisRAGRetConfig(backbone=MiniCPMVConfig(
        llm=MiniCPMConfig(vocab_size=256, hidden_size=128,
                          intermediate_size=256, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=4,
                          dtype=jnp.float32),
        vit=SiglipViTConfig(dtype=jnp.float32),
        resampler=ResamplerConfig(num_queries=QUERY_NUM, embed_dim=128,
                                  kv_dim=1152, num_heads=1,
                                  dtype=jnp.float32),
        query_num=QUERY_NUM, scale_resolution=SCALE_RES))
    state = {k: v for k, v in ref_model.state_dict().items()}
    params = {"params": {"backbone": __import__(
        "visrag_tpu.models.hf_loader", fromlist=["convert_minicpmv"]
    ).convert_minicpmv(state)}}
    return VisRAGRet(cfg), params


def _pages():
    from PIL import Image
    rng = np.random.default_rng(7)
    sizes = [(40, 52), (130, 60), (90, 90), (60, 118)]
    return [Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
            for (w, h) in sizes]


def _our_batch(items):
    from visrag_tpu.preprocess.pipeline import (PipelineConfig,
                                                build_encode_batch)
    from visrag_tpu.preprocess.tokenize import MockTokenizer
    pcfg = PipelineConfig(seq_len=96, query_num=QUERY_NUM, patch_size=14,
                          src_grid=27, scale_resolution=SCALE_RES,
                          max_patches=64)
    return build_encode_batch(MockTokenizer(), items, pcfg)


def _torch_embed(ref_model, items, arrs):
    """Reference-side embeddings: slice_image → ViT+resampler → scatter →
    LM → wmean → L2, driven with the same token layout our pipeline built."""
    import torch
    from openmatch.modeling.modeling_minicpmv.modeling_minicpmv import (
        slice_image)

    def to_tensor(img):
        a = np.asarray(img, np.float32) / 255.0
        a = (a - 0.5) / 0.5                      # Inception mean/std
        return torch.tensor(a.transpose(2, 0, 1))

    out = []
    for i, (text, img) in enumerate(items):
        ids = torch.tensor(arrs["input_ids"][i:i + 1].astype(np.int64))
        mask = torch.tensor(arrs["attention_mask"][i:i + 1].astype(np.int64))
        pix = []
        if img is not None:
            source, patches, grid = slice_image(
                img, max_slice_nums=9, scale_resolution=SCALE_RES,
                patch_size=14)
            pix = [to_tensor(source)]
            if grid is not None:
                for row in patches:
                    pix.extend(to_tensor(p) for p in row)
        slot = arrs["slot_map"][i]
        bounds = []
        pos_all = np.nonzero(slot >= 0)[0]
        if pos_all.size:
            for s in np.unique(slot[pos_all] // QUERY_NUM):
                pos = pos_all[slot[pos_all] // QUERY_NUM == s]
                bounds.append([int(pos.min()), int(pos.max()) + 1])
        data = {"input_ids": ids,
                "image_bound": [torch.tensor(bounds, dtype=torch.long)],
                "pixel_values": [pix]}
        with torch.no_grad():
            emb, _ = ref_model.get_vllm_embedding(data)
            # use_cache=False: the vendored MiniCPM's cache path uses an old
            # transformers DynamicCache API removed in this image
            hidden = ref_model.llm.model(
                input_ids=None, inputs_embeds=emb, attention_mask=mask,
                use_cache=False, return_dict=True).last_hidden_state
            # wmean + L2 (dense_retrieval_model.py:180-184, 222-223)
            w = (mask * mask.cumsum(dim=1)).unsqueeze(-1).float()
            reps = (hidden * w).sum(1) / w.sum(1)
            reps = torch.nn.functional.normalize(reps, dim=-1)
        out.append(reps[0].numpy())
    return np.stack(out)


def test_composite_embedding_and_rank_parity(ref_model, our_model):
    from visrag_tpu.models.visrag_ret import EncodeBatch

    model, params = our_model
    pages = _pages()
    page_items = [("", img) for img in pages]
    query_items = [("what is the 2020 trend?", None),
                   ("total sales by region", None),
                   ("who is the author", None)]

    page_arrs = _our_batch(page_items)
    query_arrs = _our_batch(query_items)

    ours_p = np.asarray(model.apply(
        params, EncodeBatch(**{k: jnp.asarray(v)
                               for k, v in page_arrs.items()})))
    ours_q = np.asarray(model.apply(
        params, EncodeBatch(**{k: jnp.asarray(v)
                               for k, v in query_arrs.items()})))

    ref_p = _torch_embed(ref_model, page_items, page_arrs)
    ref_q = _torch_embed(ref_model, query_items, query_arrs)

    np.testing.assert_allclose(ours_p, ref_p, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours_q, ref_q, rtol=2e-3, atol=2e-3)

    # Recall rank parity: identical retrieval order on the tiny corpus
    ours_rank = np.argsort(-(ours_q @ ours_p.T), axis=1)
    ref_rank = np.argsort(-(ref_q @ ref_p.T), axis=1)
    np.testing.assert_array_equal(ours_rank, ref_rank)
    # and the scores themselves agree tightly
    np.testing.assert_allclose(ours_q @ ours_p.T, ref_q @ ref_p.T, atol=5e-3)
