"""Structural reparameterization folds: train-time branches -> fused convs.

FastViT/MobileOne checkpoints store multi-branch train-time parameters
(k x k conv branches + 1x1 scale branch + BN identity; RepMixer's norm/mixer
pair; ReparamLargeKernelConv's large+small kernels). Our TPU modules are the
fused single-conv inference form (``models/fastvit.py``), so conversion folds
branches at load time. The math is the standard RepVGG/MobileOne/FastViT
reparameterization:

    conv+BN    ->  w' = w * gamma/sqrt(var+eps),  b' = beta + (b-mean)*gamma/sqrt(var+eps)
    1x1 branch ->  zero-pad to k x k (center tap)
    BN identity->  dirac kernel folded through the BN
    sum all branches' (w, b)
    RepMixer   ->  w = I + ls * (w_mixer - w_norm),  b = ls * (b_mixer - b_norm)
    RepLKC     ->  large-kernel fold + center-padded small-kernel fold

All functions operate on torch-layout kernels (O, I/g, kH, kW); use
``torch_conv_to_flax`` for the final transpose. Numeric equivalence of each
fold (branch-sum == fused conv) is pinned in tests/test_reparam.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .weights import fold_conv_bn


def pad_kernel_to(w: np.ndarray, k: int) -> np.ndarray:
    """Zero-pad a (O, I, kh, kw) kernel to (O, I, k, k) centered."""
    kh, kw = w.shape[2:]
    ph, pw = (k - kh) // 2, (k - kw) // 2
    return np.pad(w, ((0, 0), (0, 0), (ph, k - kh - ph), (pw, k - kw - pw)))


def identity_kernel(channels: int, groups: int, k: int, dtype=np.float32) -> np.ndarray:
    """Dirac kernel: conv(x, w_id) == x, for (O=C, I=C/g, k, k) layout."""
    in_per_group = channels // groups
    w = np.zeros((channels, in_per_group, k, k), dtype)
    for o in range(channels):
        w[o, o % in_per_group, k // 2, k // 2] = 1.0
    return w


def fold_bn_only(
    channels: int,
    groups: int,
    k: int,
    gamma: np.ndarray,
    beta: np.ndarray,
    mean: np.ndarray,
    var: np.ndarray,
    eps: float = 1e-5,
):
    """A BN-only (identity) branch folded into conv form."""
    return fold_conv_bn(
        identity_kernel(channels, groups, k), None, gamma, beta, mean, var, eps
    )


def fuse_mobileone_block(
    conv_branches: list[tuple[np.ndarray, dict]],
    scale_branch: Optional[tuple[np.ndarray, dict]],
    skip_bn: Optional[dict],
    kernel_size: int,
    channels_out: int,
    groups: int,
    eps: float = 1e-5,
) -> tuple[np.ndarray, np.ndarray]:
    """MobileOneBlock fold: sum of k x k conv+BN branches, a 1x1 conv+BN
    scale branch (padded to k x k), and a BN identity skip.

    Each branch is (conv_weight, bn_dict) where bn_dict has
    weight/bias/running_mean/running_var. Returns fused (w, b) in torch
    layout.
    """
    w_total = None
    b_total = None

    def acc(w, b):
        nonlocal w_total, b_total
        w_total = w if w_total is None else w_total + w
        b_total = b if b_total is None else b_total + b

    for conv_w, bn in conv_branches:
        w, b = fold_conv_bn(
            conv_w, None, bn["weight"], bn["bias"],
            bn["running_mean"], bn["running_var"], eps,
        )
        acc(w, b)

    if scale_branch is not None:
        conv_w, bn = scale_branch
        w, b = fold_conv_bn(
            conv_w, None, bn["weight"], bn["bias"],
            bn["running_mean"], bn["running_var"], eps,
        )
        acc(pad_kernel_to(w, kernel_size), b)

    if skip_bn is not None:
        w, b = fold_bn_only(
            channels_out, groups, kernel_size,
            skip_bn["weight"], skip_bn["bias"],
            skip_bn["running_mean"], skip_bn["running_var"], eps,
        )
        acc(w, b)

    return w_total, b_total


def fuse_repmixer(
    norm_w: np.ndarray,
    norm_b: np.ndarray,
    mixer_w: np.ndarray,
    mixer_b: np.ndarray,
    layer_scale: Optional[np.ndarray],
    channels: int,
    kernel_size: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """RepMixer fold (FastViT eq.): out = x + ls*(mixer(x) - norm(x))
    -> single dw conv  w = I + ls*(w_mixer - w_norm).

    ``norm_w``/``mixer_w`` are the already-BN-folded depthwise branch kernels
    (use ``fuse_mobileone_block`` on each first). ``layer_scale`` is the
    per-channel gamma or None.
    """
    ident = identity_kernel(channels, channels, kernel_size)
    delta_w = mixer_w - norm_w
    delta_b = mixer_b - norm_b
    if layer_scale is not None:
        ls = layer_scale.reshape(-1, 1, 1, 1)
        delta_w = delta_w * ls
        delta_b = delta_b * layer_scale.reshape(-1)
    return ident + delta_w, delta_b


def fuse_repcpe(
    pe_w: np.ndarray, pe_b: np.ndarray, channels: int, kernel_size: int = 7
) -> tuple[np.ndarray, np.ndarray]:
    """RepCPE fold: out = x + conv(x) -> w = I + w_pe."""
    return identity_kernel(channels, channels, kernel_size) + pe_w, pe_b


def fuse_large_kernel_conv(
    lkb_w: np.ndarray,
    lkb_bn: dict,
    small_w: Optional[np.ndarray],
    small_bn: Optional[dict],
    kernel_size: int,
    eps: float = 1e-5,
) -> tuple[np.ndarray, np.ndarray]:
    """ReparamLargeKernelConv fold: 7x7 conv+BN plus center-padded 3x3 conv+BN."""
    w, b = fold_conv_bn(
        lkb_w, None, lkb_bn["weight"], lkb_bn["bias"],
        lkb_bn["running_mean"], lkb_bn["running_var"], eps,
    )
    if small_w is not None:
        ws, bs = fold_conv_bn(
            small_w, None, small_bn["weight"], small_bn["bias"],
            small_bn["running_mean"], small_bn["running_var"], eps,
        )
        w = w + pad_kernel_to(ws, kernel_size)
        b = b + bs
    return w, b


def bn_to_affine(bn: dict, eps: float = 1e-5) -> tuple[np.ndarray, np.ndarray]:
    """Inference BatchNorm -> per-channel (scale, bias) for ChannelAffine."""
    scale = bn["weight"] / np.sqrt(bn["running_var"] + eps)
    bias = bn["bias"] - bn["running_mean"] * scale
    return scale, bias
