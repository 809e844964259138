"""Preprocessing parity: slicing math, sincos embeds, pos-resample matrix,
prompt/slot-map construction."""

import numpy as np
import pytest
from PIL import Image

from visrag_tpu.models.common import get_2d_sincos_pos_embed
from visrag_tpu.preprocess.slicing import (ensure_divide, find_best_resize,
                                           get_refine_size, plan_slices)
from visrag_tpu.preprocess.tokenize import (MockTokenizer, build_page_prompt,
                                            build_slot_map, image_bounds,
                                            pad_batch, tokenize_prompt)
from visrag_tpu.preprocess.transform import (normalize_image, patchify,
                                             pos_resample_matrix,
                                             prepare_page)

from ref_oracle import slicing_oracle, sincos_oracle

SIZES = [(800, 1100), (448, 448), (1654, 2339), (300, 200), (2000, 500),
         (640, 640), (1280, 720), (123, 457), (4000, 3000), (210, 297),
         (1920, 1080), (500, 2000), (447, 449), (896, 896), (1000, 1000)]


def test_slicing_math_matches_reference():
    ref = slicing_oracle()
    for size in SIZES:
        for ps in (14,):
            assert find_best_resize(size, 448, ps) == \
                ref["find_best_resize"](size, 448, ps)
            assert find_best_resize(size, 448, ps, True) == \
                ref["find_best_resize"](size, 448, ps, True)
        img = Image.new("RGB", size)
        src_ref, patches_ref, grid_ref = ref["slice_image"](img)
        plan = plan_slices(size)
        assert plan.source_size == src_ref.size
        if grid_ref is None:
            assert plan.grid is None and not plan.crop_boxes
        else:
            assert plan.grid == tuple(grid_ref)
            flat = [p for row in patches_ref for p in row]
            assert len(plan.crop_boxes) == len(flat)
            # crop sizes must match the reference patch sizes
            for box, p in zip(plan.crop_boxes, flat):
                assert (box[2] - box[0], box[3] - box[1]) == p.size


def test_ensure_divide_matches():
    ref = slicing_oracle()["ensure_divide"]
    for v in [1, 7, 13.5, 14, 20.999, 447.3, 448, 1341.2]:
        assert ensure_divide(v, 14) == ref(v, 14)


def test_sincos_matches_reference():
    ref = sincos_oracle()["get_2d_sincos_pos_embed"]
    for dim, grid in [(16, 4), (64, 8), (32, (3, 5))]:
        want = ref(dim, grid if isinstance(grid, int) else list(grid))
        gh, gw = (grid, grid) if isinstance(grid, int) else grid
        got = get_2d_sincos_pos_embed(dim, gh, gw)
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5,
                                   atol=1e-6)


def test_sincos_device_matches_host():
    import jax.numpy as jnp
    from visrag_tpu.models.common import sincos_2d_device
    host = get_2d_sincos_pos_embed(32, 3, 5)
    dev = np.asarray(sincos_2d_device(32, jnp.int32(3), jnp.int32(5), 15))
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


def test_pos_resample_matrix_matches_torch_interpolate():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(729, 24)).astype(np.float32)
    for gh, gw in [(32, 32), (11, 96), (20, 40)]:
        want = F.interpolate(
            torch.tensor(pos, dtype=torch.float32).reshape(1, 27, 27, 24)
            .permute(0, 3, 1, 2),
            size=(gh, gw), mode="bicubic", antialias=True,
            align_corners=False).permute(0, 2, 3, 1).reshape(gh * gw, 24).numpy()
        mat = pos_resample_matrix(gh, gw, 27, max_patches=gh * gw)
        got = mat @ pos
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_patchify_conv_equivalence():
    """patchify + matmul == Conv2d(stride=patch) on the same weights."""
    import torch
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(3, 28, 42)).astype(np.float32)
    w = rng.normal(size=(8, 3, 14, 14)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    conv = torch.nn.functional.conv2d(
        torch.tensor(arr)[None], torch.tensor(w), torch.tensor(b), stride=14)
    want = conv[0].permute(1, 2, 0).reshape(-1, 8).numpy()  # NHWC row-major
    patches, mask, (gh, gw) = patchify(arr, 14, max_patches=16)
    got = patches[:gh * gw] @ w.reshape(8, -1).T + b
    assert (gh, gw) == (2, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert mask.sum() == 6


def test_prompt_and_slot_map():
    tok = MockTokenizer()
    prompt = build_page_prompt(tok, "hello", (2, 2), query_num=4)
    ids = tokenize_prompt(tok, prompt, max_inp_length=256)
    bounds = image_bounds(ids, tok.im_start_id, tok.im_end_id)
    assert len(bounds) == 5  # source + 4 grid cells
    for s, e in bounds:
        assert e - s == 4
        assert all(ids[s:e] == tok.unk_id)
    smap = build_slot_map(ids, 256, tok.im_start_id, tok.im_end_id, 4, 0)
    # each bound filled with consecutive flat indices
    for i, (s, e) in enumerate(bounds):
        np.testing.assert_array_equal(smap[s:e], np.arange(i * 4, i * 4 + 4))
    assert (smap[:len(ids)][ids == tok.im_start_id] == -1).all()


def test_truncated_image_bound_dropped():
    tok = MockTokenizer()
    prompt = build_page_prompt(tok, "x", None, query_num=8)
    ids = tokenize_prompt(tok, prompt, max_inp_length=6)  # cuts inside bound
    assert len(image_bounds(ids, tok.im_start_id, tok.im_end_id)) == 0


def test_prepare_page_buffers():
    img = Image.new("RGB", (800, 1100), (255, 0, 0))
    plan, slices = prepare_page(img)
    assert plan.num_slices == len(slices)
    for s in slices:
        n = s["grid_h"] * s["grid_w"]
        assert s["mask"].sum() == n
        assert s["patches"].shape[1] == 3 * 14 * 14
        # red pixels normalize to (1, -1, -1)
        row = s["patches"][0].reshape(3, 14, 14)
        np.testing.assert_allclose(row[0], 1.0, atol=1e-6)
        np.testing.assert_allclose(row[1], -1.0, atol=1e-6)


def test_pad_batch():
    ids, mask = pad_batch([np.array([1, 2, 3]), np.array([4])], 5)
    np.testing.assert_array_equal(ids, [[1, 2, 3, 0, 0], [4, 0, 0, 0, 0]])
    np.testing.assert_array_equal(mask, [[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]])


def test_device_mode_matches_host_pipeline():
    """Raw uint8+factorized batch finished on device == the classic
    host-built EncodeBatch (up to f32 outer-product rounding)."""
    import numpy as np
    from PIL import Image
    import jax
    from visrag_tpu.preprocess.device import finish_encode_batch
    from visrag_tpu.preprocess.pipeline import (PipelineConfig,
                                                build_encode_batch)
    from visrag_tpu.preprocess.tokenize import MockTokenizer

    rng = np.random.default_rng(3)
    pages = [("q1", Image.fromarray(
        rng.integers(0, 255, (40, 52, 3), dtype=np.uint8))),
        ("", Image.fromarray(
            rng.integers(0, 255, (90, 61, 3), dtype=np.uint8))),
        ("text only", None)]
    pcfg = PipelineConfig(seq_len=96, query_num=4, patch_size=14, src_grid=27,
                          scale_resolution=56, max_patches=64)
    host = build_encode_batch(MockTokenizer(), pages, pcfg)
    raw = build_encode_batch(MockTokenizer(), pages, pcfg, device_mode=True)
    eb = jax.jit(finish_encode_batch)(raw)
    # padded patch rows are garbage by contract (zeros host-side, -1 after
    # device normalization) — compare valid rows only
    valid = host["patch_mask"].astype(bool)
    np.testing.assert_allclose(np.asarray(eb.patches)[valid],
                               host["patches"][valid], atol=1e-5)
    np.testing.assert_allclose(np.asarray(eb.pos_matrix)[valid],
                               host["pos_matrix"][valid], atol=1e-5)
    for k in ("input_ids", "attention_mask", "patch_mask", "grid_h",
              "grid_w", "slot_map"):
        np.testing.assert_array_equal(np.asarray(getattr(eb, k)), host[k])


def test_layout_preserving_ocr_matches_reference():
    """layout_preserving_text == the reference's tostr_layout_preserving
    (AST-extracted oracle) on fuzzed box layouts (VERDICT next-round #10)."""
    import numpy as np
    from ref_oracle import load_functions
    from visrag_tpu.preprocess.ocr import layout_preserving_text

    fns = load_functions(
        "visrag_scripts/demo/ocr_pipeline/layout_preserving/demo.py",
        ["calculate_spaces_and_newlines", "tostr_layout_preserving"],
        extra_ns={"MIN_SCORE": 0.6})

    class FakeResult:
        def __init__(self, rects, texts):
            # axis-aligned quad per rect: (x0,y0, x1,y0, x1,y1, x0,y1)
            self.boxes = [[x0, y0, x1, y0, x1, y1, x0, y1]
                          for (x0, y0, x1, y1) in rects]
            self.text = texts
            self.rec_scores = [1.0] * len(texts)

    rng = np.random.default_rng(0)
    for trial in range(50):
        n = int(rng.integers(1, 12))
        rects, texts, dets = [], [], []
        for i in range(n):
            x0 = float(rng.integers(0, 800))
            y0 = float(rng.integers(0, 1000))
            w = float(rng.integers(20, 200))
            h = float(rng.integers(8, 24))
            t = f"w{trial}_{i}"
            rects.append((x0, y0, x0 + w, y0 + h))
            texts.append(t)
            dets.append((x0, y0, x0 + w, y0 + h, t))
        want = fns["tostr_layout_preserving"](FakeResult(rects, texts))
        got = layout_preserving_text(dets)
        assert got == want, (trial, got, want)


def test_office_conversion_gated():
    """Office formats route through the LibreOffice gate with a clear error
    when soffice is absent (the reference's doc2pdf/ppt2pdf are win32com-
    bound; file2img parity at the dispatch level)."""
    import shutil
    import pytest
    from visrag_tpu.preprocess.rasterize import file_to_images, OFFICE_EXTS

    assert ".docx" in OFFICE_EXTS and ".pptx" in OFFICE_EXTS
    if shutil.which("soffice") or shutil.which("libreoffice"):
        pytest.skip("LibreOffice present; conversion exercised elsewhere")
    with pytest.raises(RuntimeError, match="soffice"):
        list(file_to_images("/tmp/nonexistent.docx"))
    with pytest.raises(ValueError, match="unsupported"):
        list(file_to_images("/tmp/nonexistent.xyz"))
