"""Image preprocessing ops: letterbox resize + pad + normalize.

Reimplements the reference letterbox math exactly (``fastvlm_adapter.py:36-55``):
``ratio = max(w/W, h/H)``, truncating-int resized dims, bilinear resize with
half-pixel centers (torch ``align_corners=False``, no antialias), then pad on
the *top and left* to the square target. ImageNet normalization matches
``fastvlm_adapter.py:463-477``.

All functions are shape-static and jit-safe; they are also fused by XLA with
the downstream patch embedding when called inside the jitted policy step. A
host-side C++ implementation for uint8 camera frames lives in
``vla_fastvlm_tpu/native`` for dataloader-side preprocessing overlap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _interp_matrix(in_size: int, out_size: int, dtype=np.float32) -> np.ndarray:
    """(out, in) bilinear interpolation matrix, half-pixel centers
    (torch ``align_corners=False``, no antialias)."""
    src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = src.astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(dtype)
    mat = np.zeros((out_size, in_size), dtype)
    rows = np.arange(out_size)
    mat[rows, lo] += 1.0 - w_hi
    mat[rows, hi] += w_hi
    return mat


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of (B, C, H, W), torch ``align_corners=False`` semantics.

    Implemented as two matmuls with static interpolation matrices
    (``out = R_h @ img @ R_w^T``): separable bilinear maps exactly onto the
    MXU, avoiding the gather-based lowering of ``jax.image.resize`` (the
    reference's ``F.interpolate`` is the same math, ``fastvlm_adapter.py:48``).
    """
    b, c, in_h, in_w = img.shape
    if (in_h, in_w) == (out_h, out_w):
        return img
    r_h = jnp.asarray(_interp_matrix(in_h, out_h), jnp.float32)
    r_w = jnp.asarray(_interp_matrix(in_w, out_w), jnp.float32)
    out = jnp.einsum(
        "oh,bchw,pw->bcop", r_h, img.astype(jnp.float32), r_w,
        preferred_element_type=jnp.float32,
    )
    return out.astype(img.dtype)


def resize_with_pad(
    img: jnp.ndarray, width: int, height: int, pad_value: float = 0.0
) -> jnp.ndarray:
    """Resize preserving aspect ratio, then pad top/left to (height, width).

    Parity with reference ``resize_with_pad`` (``fastvlm_adapter.py:36-55``):
    deterministic top/left fill so geometry is never distorted.
    """
    if img.ndim != 4:
        raise ValueError(f"(B,C,H,W) expected, but got shape {tuple(img.shape)}")

    cur_height, cur_width = img.shape[2:]
    if (cur_height, cur_width) == (height, width):
        # Already target-sized: resize would be an exact identity (ratio 1,
        # zero padding) but still cost a full bilinear gather — skip it.
        return img
    ratio = max(cur_width / width, cur_height / height)
    resized_height = int(cur_height / ratio)
    resized_width = int(cur_width / ratio)
    resized = resize_bilinear(img, resized_height, resized_width)

    pad_height = max(0, int(height - resized_height))
    pad_width = max(0, int(width - resized_width))
    return jnp.pad(
        resized,
        ((0, 0), (0, 0), (pad_height, 0), (pad_width, 0)),
        constant_values=pad_value,
    )


def normalize_imagenet(img: jnp.ndarray) -> jnp.ndarray:
    """Scale [0,255]-range input to [0,1] if needed, then ImageNet-normalize.

    Matches reference ``_maybe_normalize_imagenet`` (``fastvlm_adapter.py:463-477``)
    except the [0,255] check is per-batch-static: callers pass [0,1] floats
    (the dataset transform already rescales, ``aloha_dataset.py:26-37``).
    """
    mean = jnp.asarray(IMAGENET_MEAN, dtype=img.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, dtype=img.dtype).reshape(1, 3, 1, 1)
    return (img - mean) / std


def prepare_image_batch(
    img: jnp.ndarray,
    size: int,
    resize_with_padding: bool = True,
    pad_value: float = 0.0,
    normalize: bool = False,
    dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """(B, C, H, W) float in [0,1] -> (B, 3, size, size), the model-facing layout.

    Mirrors the reference pipeline ``_prepare_images_tensor``
    (``fastvlm_adapter.py:479-488``) + channel fixes (``:444-449``): grayscale is
    broadcast to 3 channels, extra channels truncated, then letterbox (or plain
    bilinear square resize), then optional ImageNet normalization. Runs on
    device inside the jitted step — the reference pins this to CPU per batch
    (``fastvlm_adapter.py:485``), which starves the accelerator.
    """
    if img.shape[1] == 1:
        img = jnp.broadcast_to(img, (img.shape[0], 3) + img.shape[2:])
    elif img.shape[1] > 3:
        img = img[:, :3]

    if resize_with_padding:
        img = resize_with_pad(img, width=size, height=size, pad_value=pad_value)
    elif img.shape[-2:] != (size, size):
        img = resize_bilinear(img, size, size)

    if normalize:
        img = normalize_imagenet(img)
    if dtype is not None:
        img = img.astype(dtype)
    return img
