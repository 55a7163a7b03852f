"""Unit tests for core ops vs reference numerics (torch / naive numpy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vla_fastvlm_tpu.ops.attention import (
    dot_product_attention,
    make_attention_bias,
    repeat_kv,
)
from vla_fastvlm_tpu.ops.image import (
    normalize_imagenet,
    prepare_image_batch,
    resize_with_pad,
)
from vla_fastvlm_tpu.ops.norms import layer_norm, rms_norm

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_resize_with_pad(img, width, height, pad_value=0.0):
    """Literal transcription of reference ``fastvlm_adapter.py:36-55`` math."""
    cur_height, cur_width = img.shape[2:]
    ratio = max(cur_width / width, cur_height / height)
    resized_height = int(cur_height / ratio)
    resized_width = int(cur_width / ratio)
    resized = F.interpolate(
        img, size=(resized_height, resized_width), mode="bilinear", align_corners=False
    )
    pad_height = max(0, int(height - resized_height))
    pad_width = max(0, int(width - resized_width))
    return F.pad(resized, (pad_width, 0, pad_height, 0), value=pad_value)


@pytest.mark.parametrize("hw", [(480, 640), (640, 480), (512, 512), (100, 300)])
def test_resize_with_pad_matches_reference(rng, hw):
    h, w = hw
    img = rng.random((2, 3, h, w), dtype=np.float32)
    ours = np.asarray(resize_with_pad(jnp.asarray(img), width=256, height=256, pad_value=0.5))
    theirs = _torch_resize_with_pad(torch.tensor(img), 256, 256, pad_value=0.5).numpy()
    assert ours.shape == theirs.shape == (2, 3, 256, 256)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_prepare_image_batch_channels(rng):
    gray = rng.random((2, 1, 64, 64), dtype=np.float32)
    out = prepare_image_batch(jnp.asarray(gray), size=32)
    assert out.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(out[:, 0], out[:, 2])

    rgba = rng.random((2, 5, 64, 64), dtype=np.float32)
    out = prepare_image_batch(jnp.asarray(rgba), size=32)
    assert out.shape == (2, 3, 32, 32)


def test_normalize_imagenet(rng):
    img = rng.random((1, 3, 8, 8), dtype=np.float32)
    out = np.asarray(normalize_imagenet(jnp.asarray(img)))
    mean = np.array([0.485, 0.456, 0.406]).reshape(1, 3, 1, 1)
    std = np.array([0.229, 0.224, 0.225]).reshape(1, 3, 1, 1)
    np.testing.assert_allclose(out, (img - mean) / std, rtol=1e-5, atol=1e-6)


def test_rms_norm_matches_torch(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    ours = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    xt = torch.tensor(x)
    ref = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)) * torch.tensor(w)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    ref = F.layer_norm(torch.tensor(x), (16,), torch.tensor(w), torch.tensor(b))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_attention_matches_torch_sdpa(rng):
    b, t, n, d = 2, 6, 4, 8
    q = rng.standard_normal((b, t, n, d)).astype(np.float32)
    k = rng.standard_normal((b, t, 2, d)).astype(np.float32)
    v = rng.standard_normal((b, t, 2, d)).astype(np.float32)
    mask = np.ones((b, t), dtype=np.int32)
    mask[1, 4:] = 0

    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    bias = make_attention_bias(pos, pos, jnp.asarray(mask), causal=True)
    ours = np.asarray(
        dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias=bias)
    )

    qt = torch.tensor(q).transpose(1, 2)  # (B, N, T, D)
    kt = torch.tensor(np.asarray(repeat_kv(jnp.asarray(k), 2))).transpose(1, 2)
    vt = torch.tensor(np.asarray(repeat_kv(jnp.asarray(v), 2))).transpose(1, 2)
    attn_mask = torch.zeros((b, 1, t, t))
    causal = torch.tril(torch.ones(t, t, dtype=torch.bool))
    key_ok = torch.tensor(mask, dtype=torch.bool)[:, None, None, :]
    allowed = causal[None, None] & key_ok
    attn_mask = attn_mask.masked_fill(~allowed, float("-inf"))
    ref = F.scaled_dot_product_attention(qt, kt, vt, attn_mask=attn_mask)
    ref = ref.transpose(1, 2).numpy()

    real = mask.astype(bool)
    np.testing.assert_allclose(ours[real], ref[real], rtol=1e-5, atol=1e-5)
