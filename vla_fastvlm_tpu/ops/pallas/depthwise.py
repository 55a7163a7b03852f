"""Pallas TPU depthwise convolution (NHWC, stride 1, SAME).

STATUS: correct (bit-exact vs lax.conv on chip) but NOT wired into the model.
Measured on v5e at stage-1 shapes: 10.5 ms/op (k=7) vs XLA's 3.4 ms — the
synchronous halo DMA (no double buffering across grid cells; manual copies
from `pl.ANY` don't get Mosaic's automatic pipelining) and fp32 tap
accumulation dominate. Kept as the starting point for the fused
RepMixer/ConvFFN block kernel (ROADMAP.md #1), where keeping the tile
resident across dw3 -> dw7 -> fc matmuls amortizes exactly these costs.

Depthwise convs carry most of FastViTHD's non-matmul time (RepMixer mixers,
RepCPE, ConvFFN's 7x7 — VPU-bound). This kernel streams a haloed row-block
per (batch, channel-block) into VMEM and performs all k*k taps as vectorized
FMAs with fp32 accumulation, fusing bias and (optionally) GELU into the same
pass.

Design:
- input is XLA-padded by k//2 on H and W so every haloed window is in
  bounds — halo reads are one static-size async DMA from HBM per grid cell
  (overlapping windows cannot be expressed with BlockSpec index maps);
- grid (B, C/128, H/HB): channels ride the 128-wide lane dim, row blocks
  size to VMEM;
- taps are static slices of the VMEM tile: ``acc += tile[dy:dy+HB, dx:dx+W]
  * w[dy, dx]`` — pure VPU work at unit stride.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _dw_kernel(
    x_ref,  # HBM: (B, H+2p, W+2p(+align), C)
    w_ref,  # VMEM: (k, k, LANES)
    b_ref,  # VMEM: (1, LANES)
    o_ref,  # VMEM: (1, HB, W, LANES)
    tiles,  # scratch VMEM: (2, HB+2p, W_dma, LANES) double buffer
    sems,  # DMA semaphores (2,)
    *,
    k: int,
    hb: int,
    w_out: int,
    activate: bool,
    n_htiles: int,
):
    bi = pl.program_id(0)
    cb = pl.program_id(1)
    hi = pl.program_id(2)
    p2 = k - 1  # 2 * pad
    w_dma = tiles.shape[2]

    def dma(slot, tile_idx):
        return pltpu.make_async_copy(
            x_ref.at[
                bi,
                pl.ds(tile_idx * hb, hb + p2),
                pl.ds(0, w_dma),
                pl.ds(cb * LANES, LANES),
            ],
            tiles.at[slot],
            sems.at[slot],
        )

    slot = hi % 2
    # Double buffering: the first step of each (batch, channel) row kicks off
    # its own copy; every step then prefetches the NEXT tile before waiting
    # on its own, overlapping tile i's compute with tile i+1's DMA.
    @pl.when(hi == 0)
    def _():
        dma(slot, hi).start()

    @pl.when(hi + 1 < n_htiles)
    def _():
        dma(1 - slot, hi + 1).start()

    dma(slot, hi).wait()
    tile = tiles[slot]

    acc = jnp.zeros((hb, w_out, LANES), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            acc += (
                tile[dy : dy + hb, dx : dx + w_out, :].astype(jnp.float32)
                * w_ref[dy, dx, :].astype(jnp.float32)
            )
    acc += b_ref[0, :].astype(jnp.float32)
    if activate:
        acc = jax.nn.gelu(acc)
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_hb(h: int, w: int, k: int, bytes_per_el: int = 4) -> int:
    # tile + acc must fit comfortably in VMEM (~16 MB; keep under ~6 MB)
    budget = 6 * 1024 * 1024
    for hb in (128, 64, 32, 16, 8):
        if h % hb != 0:
            continue
        tile_b = (hb + k - 1) * (w + k - 1) * LANES * 2
        acc_b = hb * w * LANES * bytes_per_el
        if tile_b + acc_b < budget:
            return hb
    return 0


def supports_pallas_dw(shape, k: int, backend: str | None = None) -> bool:
    if backend is None:
        backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        return False
    b, h, w, c = shape
    if c % LANES != 0:
        return False
    return _pick_hb(h, w, k) > 0


def depthwise_conv(
    x: jnp.ndarray,  # (B, H, W, C)
    w: jnp.ndarray,  # (k, k, 1, C) flax HWIO depthwise kernel, or (k, k, C)
    b: jnp.ndarray,  # (C,)
    activate: bool = False,
) -> jnp.ndarray:
    """Fused depthwise conv + bias (+ GELU), NHWC stride-1 SAME."""
    if w.ndim == 4:
        w = w[:, :, 0, :]
    k = w.shape[0]
    p = k // 2
    bsz, h, w_out, c = x.shape
    hb = _pick_hb(h, w_out, k)
    assert hb > 0 and c % LANES == 0, (x.shape, k)

    # DMA slice sizes must align to the 8-sublane tiling on the W axis:
    # right-pad W so the copied width is a multiple of 8.
    w_dma = -(-(w_out + 2 * p) // 8) * 8
    extra_w = w_dma - (w_out + 2 * p)
    x_padded = jnp.pad(x, ((0, 0), (p, p), (p, p + extra_w), (0, 0)))

    n_htiles = h // hb
    grid = (bsz, c // LANES, n_htiles)
    out = pl.pallas_call(
        functools.partial(
            _dw_kernel, k=k, hb=hb, w_out=w_out, activate=activate,
            n_htiles=n_htiles,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (k, k, LANES),
                lambda bi, cb, hi: (0, 0, cb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, LANES),
                lambda bi, cb, hi: (0, cb),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, w_out, LANES),
            lambda bi, cb, hi: (bi, hi, 0, cb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w_out, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, hb + 2 * p, w_dma, LANES), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(x_padded, w.astype(x.dtype), b.astype(x.dtype).reshape(1, c))
    return out
