"""Fused RepMixer/ConvFFN block kernel (Pallas TPU).

The flagship (1024px) serving bottleneck is FastViTHD stages 1/2 — stacks of
RepMixer blocks whose unfused form makes 5 HBM round trips per block
(dw3 -> dw7 -> fc1 -> gelu -> fc2 -> layerscale+residual, BASELINE.md
per-stage profile: stage1+2 ~ 86 ms of the ~130 ms tower). This kernel
computes the ENTIRE block per grid cell on a VMEM-resident row tile:

    x ---- dw3x3 (+bias) ----------------------------.   (residual = t3)
            |                                         |
            v (halo-masked: dw7's SAME zero padding)  |
           dw7x7 (+bias)                              |
            v                                         |
           fc1 (MXU) -> GELU -> fc2 (MXU)             |
            v                                         |
           * layerscale  -------------------------- (+) --> out

Performance structure:
- The haloed input arrives as TWO non-overlapping BlockSpec operands (the
  hb-row body and the 8-row bottom halo) so Mosaic's automatic pipeline
  double-buffers the streaming — no manual DMA, compute overlaps the copies.
- One f32 upcast per tensor (hoisted out of the tap loops); dw taps are
  unit-stride VPU FMAs over static slices.
- fc1/fc2 are MXU matmuls over the (rows*W, C) tile with the 4C hidden dim
  processed in K-chunks sized to VMEM, so the hidden activation never
  reaches HBM.
- dw3 is computed with a 3-ring halo so dw7 reads in-tile values; positions
  outside the image are masked to zero, exactly reproducing the unfused
  path's SAME zero padding between the two convs.
- The lane (channel) dim is zero-padded to a multiple of 128 (Mosaic tiling
  requirement); padded channels stay exactly zero through every op.

Parity contract: bit-comparable with the unfused Flax composition in
``models/fastvit.RepMixerBlock`` (reference behavior: the VLM inside Apple's
checkpoint remote code invoked at ``fastvlm_adapter.py:533``); pinned by
``tests/test_repmixer_kernel.py`` in interpreter mode and on-chip by
``scripts/bench_repmixer.py``.

Gradients: the public entry ``repmixer_block`` carries a custom VJP whose
backward differentiates the unfused XLA composition (the backbone is frozen
under reference semantics, so this path only exists for the
``train_backbone`` extension flag).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# dw3 halo (1) + dw7 halo (3)
_PAD = 4
_DW7_PAD = 3

# Profitability gate for block_impl="auto": measured on v5e (tunnel-RTT
# corrected, scripts/bench_repmixer.py) the kernel is currently SLOWER than
# XLA's unfused composition (stage1@1024px ~5.4 vs ~3.2 ms/block) — XLA's
# conv codegen sustains ~2x this kernel's VPU tap rate. "auto" therefore
# keeps XLA; "fused" forces the kernel. Flip when a measured win lands.
AUTO_PROFITABLE = False


def _block_kernel(
    body_ref,  # VMEM (1, HB, W + 2*_PAD, C) rows [hi*HB, hi*HB + HB)
    halo_ref,  # VMEM (1, 2*_PAD, W + 2*_PAD, C) rows [hi*HB + HB, + 8)
    w3_ref,  # VMEM (3, 3, C)
    b3_ref,  # VMEM (1, C)
    w7_ref,  # VMEM (7, 7, C)
    b7_ref,  # VMEM (1, C)
    w1_ref,  # VMEM (C, F)
    b1_ref,  # VMEM (1, F)
    w2_ref,  # VMEM (F, C)
    b2_ref,  # VMEM (1, C)
    g_ref,  # VMEM (1, C) layerscale gamma
    o_ref,  # VMEM (1, HB, W, C)
    *,
    hb: int,
    h: int,
    w_img: int,
    hidden_chunk: int,
):
    hi = pl.program_id(1)
    c = o_ref.shape[-1]
    f = w1_ref.shape[-1]
    w_t3 = w_img + 2 * _DW7_PAD  # dw3-output width incl. dw7 halo
    dtype = o_ref.dtype

    # Single upcast of the full haloed tile (body rows + bottom halo rows).
    tile32 = jnp.concatenate(
        [body_ref[0].astype(jnp.float32), halo_ref[0].astype(jnp.float32)],
        axis=0,
    )  # (HB + 8, W + 8, C) f32

    # ---- dw3 over the tile incl. the dw7 halo ring -------------------------
    # W (sublane) shifts are hoisted: ONE materialized shift per dx column,
    # then the dy taps are free row-offset slices (dim 0 is untiled).
    w3 = w3_ref[...].astype(jnp.float32)
    acc3 = jnp.zeros((hb + 2 * _DW7_PAD, w_t3, c), jnp.float32)
    for dx in range(3):
        shifted = tile32[:, dx : dx + w_t3, :]
        for dy in range(3):
            acc3 += shifted[dy : dy + hb + 2 * _DW7_PAD] * w3[dy, dx, :]
    acc3 += b3_ref[0, :].astype(jnp.float32)

    # Mask halo positions outside the image: the unfused dw7 sees SAME zero
    # padding around the *dw3 output*, not dw3-of-zero-padding (which would
    # leak the dw3 bias into the border).
    row_g = (
        jax.lax.broadcasted_iota(jnp.int32, acc3.shape, 0)
        + hi * hb
        - _DW7_PAD
    )
    col_g = jax.lax.broadcasted_iota(jnp.int32, acc3.shape, 1) - _DW7_PAD
    valid = (row_g >= 0) & (row_g < h) & (col_g >= 0) & (col_g < w_img)
    # bf16 materialization point matches the unfused path, then one upcast.
    t3 = jnp.where(valid, acc3, 0.0).astype(dtype)
    t3_32 = t3.astype(jnp.float32)

    # ---- dw7 -> (HB, W, C) --------------------------------------------------
    w7 = w7_ref[...].astype(jnp.float32)
    acc7 = jnp.zeros((hb, w_img, c), jnp.float32)
    for dx in range(7):
        shifted = t3_32[:, dx : dx + w_img, :]
        for dy in range(7):
            acc7 += shifted[dy : dy + hb] * w7[dy, dx, :]
    acc7 += b7_ref[0, :].astype(jnp.float32)
    t7 = acc7.astype(dtype).reshape(hb * w_img, c)

    # ---- fc1 -> GELU -> fc2, hidden dim in chunks (never materialized) ------
    y = jnp.zeros((hb * w_img, c), jnp.float32)
    n_chunks = f // hidden_chunk
    for ci in range(n_chunks):
        lo = ci * hidden_chunk
        hcol = (
            jnp.dot(
                t7,
                w1_ref[:, lo : lo + hidden_chunk],
                preferred_element_type=jnp.float32,
            )
            + b1_ref[0, lo : lo + hidden_chunk].astype(jnp.float32)
        )
        hcol = jax.nn.gelu(hcol.astype(dtype))
        y += jnp.dot(
            hcol, w2_ref[lo : lo + hidden_chunk, :],
            preferred_element_type=jnp.float32,
        )
    y += b2_ref[0, :].astype(jnp.float32)
    y = y.astype(dtype) * g_ref[0, :]

    resid = t3[_DW7_PAD : _DW7_PAD + hb, _DW7_PAD : _DW7_PAD + w_img, :]
    o_ref[0] = resid + y.reshape(hb, w_img, c)


def _pick_chunk(f: int, rows: int, vmem_left: int) -> int:
    """Largest MXU-friendly divisor of the hidden dim whose f32 activation
    chunk fits the remaining VMEM."""
    for chunk in (768, 512, 384, 256, 128):
        if f % chunk == 0 and rows * chunk * 4 <= vmem_left:
            return chunk
    return min(f, 128) if f < 128 else 128


def _plan(h: int, w: int, c: int, f: int, dtype_bytes: int = 2):
    """(hb, hidden_chunk) with the working set inside a ~13 MB VMEM budget."""
    budget = 13 * 1024 * 1024
    c_eff = -(-c // 128) * 128  # kernel-side lane padding
    wp = w + 2 * _PAD
    for hb in (64, 32, 16, 8):
        if h % hb != 0 or hb > h:
            continue
        rows = hb * w
        in_b = 2 * (hb + 2 * _PAD) * wp * c_eff * dtype_bytes  # double-buffered
        tile32_b = (hb + 2 * _PAD) * wp * c_eff * 4
        t3_b = (hb + 2 * _DW7_PAD) * (w + 2 * _DW7_PAD) * c_eff * (4 + dtype_bytes)
        acc7_b = rows * c_eff * 4
        y_b = rows * c_eff * 4
        wts_b = 2 * c_eff * f * dtype_bytes
        used = in_b + tile32_b + t3_b + acc7_b + y_b + wts_b
        if used >= budget:
            continue
        chunk = _pick_chunk(f, rows, budget - used)
        return hb, chunk
    return 0, 0


def supports_fused_repmixer(
    shape: tuple, hidden: int, backend: str | None = None
) -> bool:
    """True when the fused block kernel handles (B, H, W, C) + hidden dim."""
    if backend is None:
        backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        return False
    b, h, w, c = shape
    if c % 8 != 0:
        return False
    if (w + 2 * _PAD) % 8 != 0:  # streamed width must align to 8-sublane tiling
        return False
    if hidden % 128 != 0 or hidden < 128:
        return False
    return _plan(h, w, c, hidden)[0] > 0


def _repmixer_block_pallas(
    x: jnp.ndarray,  # (B, H, W, C) NHWC
    w3: jnp.ndarray,  # (3, 3, 1, C) HWIO depthwise or (3, 3, C)
    b3: jnp.ndarray,  # (C,)
    w7: jnp.ndarray,  # (7, 7, 1, C) or (7, 7, C)
    b7: jnp.ndarray,
    w1: jnp.ndarray,  # (C, F)
    b1: jnp.ndarray,  # (F,)
    w2: jnp.ndarray,  # (F, C)
    b2: jnp.ndarray,  # (C,)
    gamma: jnp.ndarray,  # (C,)
    *,
    interpret: bool = False,
    pad_lanes: bool = True,
) -> jnp.ndarray:
    if w3.ndim == 4:
        w3 = w3[:, :, 0, :]
    if w7.ndim == 4:
        w7 = w7[:, :, 0, :]
    bsz, h, w_img, c = x.shape
    f = w1.shape[-1]
    hb, hidden_chunk = _plan(h, w_img, c, f)
    if hb == 0:
        raise ValueError(f"unsupported fused-repmixer shape {x.shape} f={f}")

    # Mosaic block/DMA shapes must be 128-aligned on the lane (channel) dim:
    # pad C up (192 -> 256 at stage 1). Zero-padded channels stay exactly
    # zero through every op (zero dw weights/biases -> zero taps; zero fc1
    # rows / fc2 columns / gamma) and are sliced off at the end.
    c_orig = c
    c_pad = (-(-c // 128) * 128 - c) if pad_lanes else 0
    if c_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad)))
        w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, c_pad)))
        w7 = jnp.pad(w7, ((0, 0), (0, 0), (0, c_pad)))
        b3 = jnp.pad(b3, (0, c_pad))
        b7 = jnp.pad(b7, (0, c_pad))
        w1 = jnp.pad(w1, ((0, c_pad), (0, 0)))
        w2 = jnp.pad(w2, ((0, 0), (0, c_pad)))
        b2 = jnp.pad(b2, (0, c_pad))
        gamma = jnp.pad(gamma, (0, c_pad))
        c = c + c_pad

    x_padded = jnp.pad(x, ((0, 0), (_PAD, _PAD), (_PAD, _PAD), (0, 0)))
    n_htiles = h // hb
    dtype = x.dtype
    wp = w_img + 2 * _PAD
    hpb = hb // 8  # body rows per 8-row halo block unit

    kern = functools.partial(
        _block_kernel,
        hb=hb,
        h=h,
        w_img=w_img,
        hidden_chunk=hidden_chunk,
    )
    const = lambda bi, hi: (0, 0)
    const3 = lambda bi, hi: (0, 0, 0)
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_htiles),
        in_specs=[
            # body rows [hi*hb, hi*hb + hb) of the padded image
            pl.BlockSpec(
                (1, hb, wp, c),
                lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # bottom halo rows [hi*hb + hb, hi*hb + hb + 8): expressed in
            # 8-row block units so the two operands tile the array disjointly
            # per step while overlapping across steps.
            pl.BlockSpec(
                (1, 2 * _PAD, wp, c),
                lambda bi, hi, hpb=hpb: (bi, hi * hpb + hpb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, c), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((7, 7, c), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, w_img, c),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w_img, c), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x_padded,
        x_padded,
        w3.astype(dtype),
        b3.astype(dtype).reshape(1, c),
        w7.astype(dtype),
        b7.astype(dtype).reshape(1, c),
        w1.astype(dtype),
        b1.astype(dtype).reshape(1, f),
        w2.astype(dtype),
        b2.astype(dtype).reshape(1, c),
        gamma.astype(dtype).reshape(1, c),
    )
    return out[..., :c_orig] if c_pad else out


def _repmixer_block_xla(x, w3, b3, w7, b7, w1, b1, w2, b2, gamma):
    """Unfused reference composition (identical math to models/fastvit.py)."""
    if w3.ndim == 3:
        w3 = w3[:, :, None, :]
    if w7.ndim == 3:
        w7 = w7[:, :, None, :]
    c = x.shape[-1]
    dtype = x.dtype
    dn = jax.lax.conv_dimension_numbers(x.shape, w3.shape, ("NHWC", "HWIO", "NHWC"))
    t3 = jax.lax.conv_general_dilated(
        x, w3.astype(dtype), (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=c,
    ) + b3.astype(dtype)
    t7 = jax.lax.conv_general_dilated(
        t3, w7.astype(dtype), (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=c,
    ) + b7.astype(dtype)
    hcol = jax.nn.gelu(jnp.dot(t7, w1.astype(dtype)) + b1.astype(dtype))
    y = jnp.dot(hcol, w2.astype(dtype)) + b2.astype(dtype)
    return t3 + y * gamma.astype(dtype)


@functools.partial(jax.custom_vjp)
def repmixer_block(x, w3, b3, w7, b7, w1, b1, w2, b2, gamma):
    """Fused RepMixer block: dw3 + [dw7 -> fc1 -> GELU -> fc2] * gamma + resid.

    Forward runs the Pallas kernel; gradients (only reachable via the
    ``train_backbone`` extension — the reference's backbone is frozen) are
    the VJP of the unfused composition.
    """
    return _repmixer_block_pallas(x, w3, b3, w7, b7, w1, b1, w2, b2, gamma)


def _fwd(*args):
    return repmixer_block(*args), args


def _bwd(residuals, g):
    _, vjp = jax.vjp(_repmixer_block_xla, *residuals)
    return vjp(g)


repmixer_block.defvjp(_fwd, _bwd)
