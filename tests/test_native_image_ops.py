"""Native C++ letterbox vs the jnp device-side implementation.

Both must realize the reference math (``fastvlm_adapter.py:36-55``): truncated
aspect-preserving bilinear (align_corners=False) + top/left padding.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.native import letterbox_batch, native_available
from vla_fastvlm_tpu.native import _letterbox_numpy
from vla_fastvlm_tpu.ops.image import resize_with_pad


@pytest.fixture(scope="module")
def frames(rng_module=np.random.default_rng(0)):
    return rng_module.integers(0, 256, (3, 3, 37, 53), dtype=np.uint8)


def test_native_builds():
    assert native_available(), "g++ toolchain expected in this image"


def test_matches_jnp_letterbox(frames):
    size = 32
    out = letterbox_batch(frames, size)
    ref = np.asarray(
        resize_with_pad(jnp.asarray(frames, jnp.float32) / 255.0, size, size)
    )
    assert out.shape == ref.shape == (3, 3, size, size)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_hwc_input(frames):
    size = 32
    hwc = np.transpose(frames, (0, 2, 3, 1)).copy()
    out_hwc = letterbox_batch(hwc, size)
    out_chw = letterbox_batch(frames, size)
    np.testing.assert_allclose(out_hwc, out_chw, atol=1e-6)


def test_numpy_fallback_matches_native(frames):
    size = 24
    native = letterbox_batch(frames, size)
    fallback = _letterbox_numpy(frames, size, 0.0, 1.0 / 255.0)
    np.testing.assert_allclose(native, fallback, atol=1e-5)


def test_pad_value_and_scale(frames):
    out = letterbox_batch(frames, 64, pad_value=0.5, scale=1.0)
    # 37x53 -> ratio=53/64 -> rh=44 -> 20 rows of top padding
    assert np.allclose(out[:, :, :20, :], 0.5)
    assert out.max() > 1.5  # scale=1: raw 0..255 range preserved


def test_rejects_bad_dtype():
    with pytest.raises(TypeError):
        letterbox_batch(np.zeros((1, 3, 8, 8), np.float32), 16)
