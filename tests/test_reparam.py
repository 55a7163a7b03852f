"""Reparameterization fold math: branch-sum == fused conv, numerically.

Each fold is checked by simulating the train-time multi-branch computation in
numpy/jax (conv -> batchnorm per branch, summed, residuals) and comparing
against a single convolution with the fused weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.io.reparam import (
    bn_to_affine,
    fuse_large_kernel_conv,
    fuse_mobileone_block,
    fuse_repcpe,
    fuse_repmixer,
    identity_kernel,
    pad_kernel_to,
)
from vla_fastvlm_tpu.io.weights import fold_conv_bn, torch_conv_to_flax


def conv2d(x, w_torch, b=None, groups=1, stride=1):
    """NCHW conv with torch-layout weights, SAME padding."""
    k = w_torch.shape[-1]
    pad = k // 2
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(w_torch),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape(1, -1, 1, 1)
    return np.asarray(out)


def batchnorm(x, bn, eps=1e-5):
    scale = bn["weight"] / np.sqrt(bn["running_var"] + eps)
    bias = bn["bias"] - bn["running_mean"] * scale
    return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


def rand_bn(rng, c):
    return {
        "weight": rng.standard_normal(c).astype(np.float32),
        "bias": rng.standard_normal(c).astype(np.float32),
        "running_mean": rng.standard_normal(c).astype(np.float32),
        "running_var": rng.random(c).astype(np.float32) + 0.5,
    }


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_fold_conv_bn(rng):
    c_in, c_out, k = 4, 6, 3
    w = rng.standard_normal((c_out, c_in, k, k)).astype(np.float32)
    bn = rand_bn(rng, c_out)
    x = rng.standard_normal((2, c_in, 8, 8)).astype(np.float32)

    ref = batchnorm(conv2d(x, w), bn)
    wf, bf = fold_conv_bn(w, None, bn["weight"], bn["bias"],
                          bn["running_mean"], bn["running_var"])
    np.testing.assert_allclose(conv2d(x, wf, bf), ref, atol=1e-4)


def test_identity_kernel_grouped(rng):
    c = 6
    x = rng.standard_normal((1, c, 5, 5)).astype(np.float32)
    for groups in (1, c):
        w = identity_kernel(c, groups, 3)
        np.testing.assert_allclose(conv2d(x, w, groups=groups), x, atol=1e-6)


def test_mobileone_fold(rng):
    """conv3x3+BN + conv1x1+BN + BN-skip == fused conv."""
    c, k = 8, 3
    w3 = rng.standard_normal((c, c, k, k)).astype(np.float32)
    bn3 = rand_bn(rng, c)
    w1 = rng.standard_normal((c, c, 1, 1)).astype(np.float32)
    bn1 = rand_bn(rng, c)
    bn_skip = rand_bn(rng, c)
    x = rng.standard_normal((2, c, 9, 9)).astype(np.float32)

    ref = (
        batchnorm(conv2d(x, w3), bn3)
        + batchnorm(conv2d(x, w1), bn1)
        + batchnorm(x, bn_skip)
    )
    wf, bf = fuse_mobileone_block(
        [(w3, bn3)], (w1, bn1), bn_skip, kernel_size=k, channels_out=c, groups=1
    )
    np.testing.assert_allclose(conv2d(x, wf, bf), ref, atol=1e-4)


def test_mobileone_fold_depthwise(rng):
    c, k = 4, 3
    w3 = rng.standard_normal((c, 1, k, k)).astype(np.float32)
    bn3 = rand_bn(rng, c)
    bn_skip = rand_bn(rng, c)
    x = rng.standard_normal((1, c, 6, 6)).astype(np.float32)

    ref = batchnorm(conv2d(x, w3, groups=c), bn3) + batchnorm(x, bn_skip)
    wf, bf = fuse_mobileone_block(
        [(w3, bn3)], None, bn_skip, kernel_size=k, channels_out=c, groups=c
    )
    np.testing.assert_allclose(conv2d(x, wf, bf, groups=c), ref, atol=1e-4)


def test_repmixer_fold(rng):
    """x + ls*(mixer(x) - norm(x)) == fused dw conv."""
    c, k = 5, 3
    wm = rng.standard_normal((c, 1, k, k)).astype(np.float32)
    bm = rng.standard_normal(c).astype(np.float32)
    wn = rng.standard_normal((c, 1, k, k)).astype(np.float32)
    bn_ = rng.standard_normal(c).astype(np.float32)
    ls = (rng.random(c).astype(np.float32)) * 1e-1
    x = rng.standard_normal((2, c, 7, 7)).astype(np.float32)

    ref = x + ls.reshape(1, -1, 1, 1) * (
        conv2d(x, wm, bm, groups=c) - conv2d(x, wn, bn_, groups=c)
    )
    wf, bf = fuse_repmixer(wn, bn_, wm, bm, ls, channels=c, kernel_size=k)
    np.testing.assert_allclose(conv2d(x, wf, bf, groups=c), ref, atol=1e-4)


def test_repcpe_fold(rng):
    c, k = 4, 7
    w = rng.standard_normal((c, 1, k, k)).astype(np.float32)
    b = rng.standard_normal(c).astype(np.float32)
    x = rng.standard_normal((1, c, 9, 9)).astype(np.float32)
    ref = x + conv2d(x, w, b, groups=c)
    wf, bf = fuse_repcpe(w, b, channels=c, kernel_size=k)
    np.testing.assert_allclose(conv2d(x, wf, bf, groups=c), ref, atol=1e-4)


def test_large_kernel_fold(rng):
    c, k = 4, 7
    wl = rng.standard_normal((c, 1, k, k)).astype(np.float32)
    bnl = rand_bn(rng, c)
    ws = rng.standard_normal((c, 1, 3, 3)).astype(np.float32)
    bns = rand_bn(rng, c)
    x = rng.standard_normal((1, c, 11, 11)).astype(np.float32)

    ref = batchnorm(conv2d(x, wl, groups=c), bnl) + batchnorm(
        conv2d(x, ws, groups=c), bns
    )
    wf, bf = fuse_large_kernel_conv(wl, bnl, ws, bns, kernel_size=k)
    np.testing.assert_allclose(conv2d(x, wf, bf, groups=c), ref, atol=1e-4)


def test_bn_to_affine(rng):
    c = 6
    bn = rand_bn(rng, c)
    x = rng.standard_normal((2, c, 4, 4)).astype(np.float32)
    scale, bias = bn_to_affine(bn)
    ref = batchnorm(x, bn)
    got = x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pad_kernel_center():
    w = np.ones((2, 2, 1, 1), np.float32)
    padded = pad_kernel_to(w, 3)
    assert padded.shape == (2, 2, 3, 3)
    assert padded[0, 0, 1, 1] == 1.0 and padded.sum() == 4.0


def test_torch_conv_to_flax_layout(rng):
    """Fused torch-layout weights, transposed to flax HWIO, must reproduce the
    same conv through flax's NHWC convention — the full conversion contract."""
    c_in, c_out = 3, 5
    w = rng.standard_normal((c_out, c_in, 3, 3)).astype(np.float32)
    x = rng.standard_normal((1, c_in, 8, 8)).astype(np.float32)
    ref = conv2d(x, w)

    wf = torch_conv_to_flax(w)  # (kh, kw, I, O)
    x_nhwc = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    out = jax.lax.conv_general_dilated(
        x_nhwc, jnp.asarray(wf), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out, (0, 3, 1, 2))), ref, atol=1e-4
    )
