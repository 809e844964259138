"""Banded segment flash attention (ops/attention_kvgrid) vs the XLA oracle.

Pallas runs in interpret mode on the CPU mesh; the masking semantics are
checked against ops.attention.mha_reference on REAL rows only (the banded
kernel zeroes empty-band pad rows by contract — every caller discards them).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visrag_tpu.ops.attention import mha_reference
from visrag_tpu.ops.attention_kvgrid import (_band_bounds,
                                             flash_attention_kvgrid)


def _contig_segs(rng, total, max_len, pad):
    """Contiguous ascending ids 1..n with sizes ≤ max_len, then `pad` zeros."""
    sizes = []
    left = total
    while left > 0:
        s = int(rng.integers(1, max_len + 1))
        s = min(s, left)
        sizes.append(s)
        left -= s
    seg = np.repeat(np.arange(1, len(sizes) + 1), sizes)
    return np.concatenate([seg, np.zeros(pad, np.int32)]).astype(np.int32)


def _rand_qkv(rng, b, s, h, d):
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    return q, k, v


def test_band_bounds_exact():
    rng = np.random.default_rng(0)
    for _ in range(8):
        total = int(rng.integers(100, 900))
        pad = int(rng.integers(0, 300))
        seg = _contig_segs(rng, total, int(rng.integers(5, 90)), pad)
        S = len(seg)
        bq = bk = 128
        S_pad = -(-S // bq) * bq
        seg_p = np.concatenate([seg, np.full(S_pad - S, -1, np.int32)])
        qs = jnp.asarray(seg_p)[None]
        start, end = _band_bounds(qs, qs, bq, bk)
        start, end = np.asarray(start)[0], np.asarray(end)[0]
        nq = S_pad // bq
        nk = S_pad // bk
        for i in range(nq):
            qblk = seg_p[i * bq:(i + 1) * bq]
            real = qblk[qblk > 0]
            # brute-force allowed K blocks
            needed = set()
            for j in range(nk):
                kblk = seg_p[j * bk:(j + 1) * bk]
                if np.intersect1d(real, kblk[kblk > 0]).size:
                    needed.add(j)
            if not needed:
                assert end[i] <= start[i], (i, start[i], end[i])
                continue
            assert start[i] <= min(needed), (i, start[i], needed)
            assert end[i] >= max(needed) + 1, (i, end[i], needed)


@pytest.mark.parametrize("max_seg_len", [17, 64, None])
def test_kvgrid_matches_reference(max_seg_len):
    rng = np.random.default_rng(1)
    b, h, d = 1, 2, 32
    msl = max_seg_len or 200
    seg = _contig_segs(rng, 530, msl, 110)
    s = len(seg)
    q, k, v = _rand_qkv(rng, b, s, h, d)
    segj = jnp.asarray(seg)[None]
    o = flash_attention_kvgrid(q, k, v, segj, max_seg_len=max_seg_len,
                               block_q=128, block_k=128, interpret=True)
    ref = mha_reference(q, k, v, segj, segj, causal=False,
                        sm_scale=1.0 / np.sqrt(d))
    real = seg > 0
    np.testing.assert_allclose(np.asarray(o)[0, real],
                               np.asarray(ref)[0, real], atol=2e-5, rtol=2e-4)
    # empty-band pad rows are exact zeros by contract
    tail = np.asarray(o)[0, ~real]
    full_pad_blocks = [i for i in range(s // 128)
                       if not real[i * 128:(i + 1) * 128].any()]
    for i in full_pad_blocks:
        np.testing.assert_array_equal(np.asarray(o)[0, i * 128:(i + 1) * 128],
                                      0.0)
    assert tail.shape[0] > 0


def test_kvgrid_vision_geometry():
    """Segments from the real host prep (window + per-image full)."""
    from PIL import Image

    from visrag_tpu.preprocess.qwen_vision import prepare_vision_batch
    rng = np.random.default_rng(2)
    imgs = [Image.fromarray(rng.integers(0, 255, (252, 308, 3), np.uint8)),
            Image.fromarray(rng.integers(0, 255, (140, 196, 3), np.uint8))]
    vb = prepare_vision_batch(imgs, head_dim=32, min_pixels=56 * 56,
                              max_pixels=252 * 308,
                              pad_to=-(-sum(i.size[0] * i.size[1] //
                                            (14 * 14) for i in imgs) //
                                       128) * 128)
    s = vb.patches.shape[0]
    b, h, d = 1, 2, 32
    q, k, v = _rand_qkv(rng, b, s, h, d)
    for seg_np, msl in ((vb.seg_window, 64), (vb.seg_full, None)):
        seg = jnp.asarray(seg_np)[None]
        o = flash_attention_kvgrid(q, k, v, seg, max_seg_len=msl,
                                   block_q=128, block_k=128, interpret=True)
        ref = mha_reference(q, k, v, seg, seg, causal=False,
                            sm_scale=1.0 / np.sqrt(d))
        real = seg_np > 0
        np.testing.assert_allclose(np.asarray(o)[0, real],
                                   np.asarray(ref)[0, real],
                                   atol=2e-5, rtol=2e-4)


def test_kvgrid_grads_match_reference():
    rng = np.random.default_rng(3)
    b, h, d = 1, 2, 32
    seg = _contig_segs(rng, 300, 40, 84)
    s = len(seg)
    q, k, v = _rand_qkv(rng, b, s, h, d)
    segj = jnp.asarray(seg)[None]
    real = jnp.asarray((seg > 0).astype(np.float32))[None, :, None, None]

    def loss_kvgrid(q, k, v):
        o = flash_attention_kvgrid(q, k, v, segj, max_seg_len=40,
                                   block_q=128, block_k=128, interpret=True)
        return jnp.sum(jnp.sin(o) * real)

    def loss_ref(q, k, v):
        o = mha_reference(q, k, v, segj, segj, causal=False,
                          sm_scale=1.0 / np.sqrt(d))
        return jnp.sum(jnp.sin(o) * real)

    g1 = jax.grad(loss_kvgrid, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=3e-4)


def test_kvgrid_gqa_and_uneven_seq():
    rng = np.random.default_rng(4)
    b, h, hk, d = 2, 4, 2, 16
    seg = _contig_segs(rng, 200, 30, 51)      # length 251: not a block multiple
    s = len(seg)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hk, d)), jnp.float32)
    segj = jnp.broadcast_to(jnp.asarray(seg)[None], (b, s))
    o = flash_attention_kvgrid(q, k, v, segj, max_seg_len=30,
                               block_q=128, block_k=128, interpret=True)
    ref = mha_reference(q, jnp.repeat(k, 2, 2), jnp.repeat(v, 2, 2),
                        segj, segj, causal=False, sm_scale=1.0 / np.sqrt(d))
    real = seg > 0
    np.testing.assert_allclose(np.asarray(o)[:, real],
                               np.asarray(ref)[:, real], atol=2e-5, rtol=2e-4)


def test_attn_impl_banded_and_invalid():
    """QwenVisionConfig.attn_impl='banded' explicitly selects the kvgrid
    path (off-TPU it falls back to the XLA reference — output must equal
    the 'packed' impl); an unknown impl raises instead of silently running
    the packed kernel (the misconfiguration that would cost 7.1x on TPU)."""
    import dataclasses

    import pytest

    from visrag_tpu.models.qwen25_vl import QwenVisionConfig, QwenVisionTower
    from visrag_tpu.preprocess.qwen_vision import prepare_vision_batch
    from PIL import Image

    rng = np.random.default_rng(5)
    img = Image.fromarray(rng.integers(0, 255, (140, 196, 3), np.uint8))
    cfg = QwenVisionConfig.tiny()
    vb = prepare_vision_batch([img], head_dim=cfg.head_dim,
                              min_pixels=56 * 56, max_pixels=140 * 196)
    keys = ("patches", "rot_cos", "rot_sin", "seg_window", "seg_full",
            "reverse_index")
    batch = {k: jnp.asarray(getattr(vb, k)) for k in keys}

    def run(impl):
        tower = QwenVisionTower(dataclasses.replace(cfg, attn_impl=impl))
        p = tower.init(jax.random.PRNGKey(0), **batch)
        return np.asarray(tower.apply(p, **batch))

    np.testing.assert_allclose(run("banded"), run("packed"),
                               atol=1e-4, rtol=1e-3)
    with pytest.raises(ValueError, match="attn_impl"):
        run("flash")
