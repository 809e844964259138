"""Native C++ host kernels (visrag_tpu/native): parity vs the numpy paths."""

import numpy as np
import pytest

from visrag_tpu.native import (patchify_f32_native, patchify_u8_native,
                               _lib)
from visrag_tpu.preprocess.transform import (INCEPTION_MEAN, INCEPTION_STD,
                                             normalize_image, patchify,
                                             patchify_normalized, patchify_u8)

pytestmark = pytest.mark.skipif(_lib() is None,
                                reason="no native toolchain")


def test_patchify_u8_native_matches_numpy():
    rng = np.random.default_rng(0)
    for (h, w, ps) in ((28, 42, 14), (56, 14, 14), (12, 18, 6)):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        gh, gw = h // ps, w // ps
        n = gh * gw
        want = (arr.reshape(gh, ps, gw, ps, 3).transpose(0, 2, 4, 1, 3)
                .reshape(n, 3 * ps * ps))
        out = np.zeros((n + 3, 3 * ps * ps), np.uint8)
        assert patchify_u8_native(arr, ps, out)
        np.testing.assert_array_equal(out[:n], want)
        assert (out[n:] == 0).all()


def test_patchify_f32_native_matches_numpy():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, size=(28, 42, 3), dtype=np.uint8)
    ps, n = 14, 6
    out = np.zeros((n, 3 * ps * ps), np.float32)
    assert patchify_f32_native(arr, ps,
                               np.asarray(INCEPTION_MEAN, np.float32),
                               np.asarray(INCEPTION_STD, np.float32), out)
    ref = (arr.astype(np.float32) / 255.0
           - np.array(INCEPTION_MEAN, np.float32)) / np.array(
               INCEPTION_STD, np.float32)
    want = (ref.transpose(2, 0, 1).reshape(3, 2, ps, 3, ps)
            .transpose(1, 3, 0, 2, 4).reshape(n, 3 * ps * ps))
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


def test_wired_paths_match_fallback():
    """The public patchify_u8/patchify_normalized (native inside) equal the
    pure-numpy reference path (normalize_image → patchify)."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 255, size=(42, 28, 3), dtype=np.uint8)
    out_u8, mask, grid = patchify_u8(arr, 14, max_patches=8)
    ref = (arr.reshape(3, 14, 2, 14, 3).transpose(0, 2, 4, 1, 3)
           .reshape(6, 3 * 14 * 14))
    np.testing.assert_array_equal(out_u8[:6], ref)
    assert mask.sum() == 6 and grid == (3, 2)

    out_f32, mask2, grid2 = patchify_normalized(arr, 14, max_patches=8)
    from PIL import Image
    arr_chw = normalize_image(Image.fromarray(arr))
    want, mask3, grid3 = patchify(arr_chw, 14, max_patches=8)
    np.testing.assert_allclose(out_f32, want, rtol=1e-6, atol=1e-6)
    assert grid2 == grid3 and (mask2 == mask3).all()
