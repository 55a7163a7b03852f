"""Pallas TPU fused attention kernel.

The attention workloads in this framework are short-sequence but very hot
(SURVEY.md §2.2): Qwen2 prefill over ~64 text + <=256 image tokens per policy
step, and FastViTHD attention stages over <=1024 spatial tokens. At these
lengths the whole K/V for one (batch, head) fits comfortably in VMEM
(1344 x 128 x 4B = 0.7 MB), so the kernel streams *query blocks* over the
grid and keeps K/V resident, fusing QK^T, masking, fp32 softmax, and PV into
one pass — no HBM round-trip for the (T, S) logits, which is what XLA's
unfused path materializes.

Design notes (see /opt/skills/guides/pallas_guide.md):
- grid = (batch, q_heads, T / block_q); GQA is an index-map detail: query
  head h reads KV head h // (N // K). No repeat_kv materialization.
- fp32 accumulation via ``preferred_element_type`` on both matmuls (MXU).
- masking = key-padding mask + optional causal by absolute position; the
  additive -1e30 pattern matches the XLA reference path so both paths are
  numerically interchangeable (tests assert allclose).
- A `lax.fori_loop`-over-S-blocks online-softmax variant is the natural
  extension for long context (ring/CP seam, SURVEY.md §5); not needed for
  the reference workloads.

Backward: ``flash_attention`` is wrapped in ``jax.custom_vjp`` whose backward
recomputes attention with the XLA reference path — exact gradients, flash
speed on the (dominant, often stop-gradient'd) forward.

Status (decided, round 3): as a *prefill* kernel this is a validated
experiment that XLA beat at every production sequence length (crossover
only at >= ``MIN_AUTO_SEQ`` = 4096 tokens — measured table in
``supports_flash``); it stays available for long-context forcing and as the
measured record. Its production descendant is the **paged-attention decode
kernel** (``ops/pallas/paged_attention.py``), which reuses this kernel's
patterns (GQA-by-index-map, fp32 softmax tile, masking scheme) where a
Pallas kernel IS justified by measurement: removing the paged server's
per-tick gathered window.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, S, D)
    v_ref,  # (1, 1, S, D)
    mask_ref,  # (1, 1, S) int32 key validity
    o_ref,  # (1, 1, block_q, D)
    *,
    scale: float,
    causal: bool,
    block_q: int,
    seq_k: int,
):
    qb = pl.program_id(2)

    q = q_ref[0, 0]  # (block_q, D)
    k = k_ref[0, 0]  # (S, D)
    v = v_ref[0, 0]  # (S, D)

    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, S)
    logits = logits * scale

    kv_valid = mask_ref[0, 0, :] > 0  # (S,)
    allowed = jnp.broadcast_to(kv_valid[None, :], (block_q, seq_k))
    if causal:
        q_pos = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, seq_k), 0
        )
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, seq_k), 1)
        allowed = jnp.logical_and(allowed, k_pos <= q_pos)

    logits = jnp.where(allowed, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)

    out = jax.lax.dot_general(
        probs.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, D)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _flash_attention_forward(
    q: jnp.ndarray,  # (B, T, N, D)
    k: jnp.ndarray,  # (B, S, K, D)
    v: jnp.ndarray,  # (B, S, K, D)
    kv_mask: jnp.ndarray,  # (B, S) int32/bool
    causal: bool,
    scale: float,
    block_q: int,
) -> jnp.ndarray:
    b, t, n, d = q.shape
    s, kh = k.shape[1], k.shape[2]
    rep = n // kh

    # TPU tiling wants the (sublane, lane) dims of every block to be the last
    # two, sized in multiples of (8, 128) or the full array dim. Fold heads
    # next to batch: (B, T, N, D) -> (B, N, T, D) so blocks are (bq, D) tiles.
    q = jnp.transpose(q, (0, 2, 1, 3))
    k = jnp.transpose(k, (0, 2, 1, 3))
    v = jnp.transpose(v, (0, 2, 1, 3))

    # Pad T up to a block multiple; padded queries attend normally (keys are
    # masked, not queries) and are sliced off after.
    t_pad = -t % block_q
    if t_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad), (0, 0)))
    t_full = t + t_pad

    grid = (b, n, t_full // block_q)
    mask3 = kv_mask.astype(jnp.int32)[:, None, :]  # (B, 1, S)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel,
            scale=scale,
            causal=causal,
            block_q=block_q,
            seq_k=s,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s, d),
                lambda bi, hi, qi, rep=rep: (bi, hi // rep, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s, d),
                lambda bi, hi, qi, rep=rep: (bi, hi // rep, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s),
                lambda bi, hi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, t_full, d), q.dtype),
    )(q, k, v, mask3)

    if t_pad:
        out = out[:, :, :t]
    return jnp.transpose(out, (0, 2, 1, 3))


def _xla_reference(q, k, v, kv_mask, causal, scale):
    """Unfused reference path (identical numerics; used for VJP)."""
    n, kh = q.shape[2], k.shape[2]
    if n != kh:
        rep = n // kh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("btnd,bsnd->bnts", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    allowed = (kv_mask > 0)[:, None, None, :]
    if causal:
        t, s = q.shape[1], k.shape[1]
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, s), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
        allowed = jnp.logical_and(allowed, (k_pos <= q_pos)[None, None])
    logits = jnp.where(allowed, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnts,bsnd->btnd", probs.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 128,
) -> jnp.ndarray:
    """Fused masked attention: (B,T,N,D) x (B,S,K,D) -> (B,T,N,D).

    ``kv_mask`` is (B, S) with 1 at valid key positions. Causality is by
    absolute position within the same sequence (prefill layout).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # Sublane-align the query block: multiple of 16 covers bf16 (16) and
    # fp32 (8) tile minima.
    aligned_t = -(-q.shape[1] // 16) * 16
    block_q = min(block_q, max(16, aligned_t))
    return _flash_attention_forward(q, k, v, kv_mask, causal, scale, block_q)


def _fwd(q, k, v, kv_mask, causal, scale, block_q):
    out = flash_attention(q, k, v, kv_mask, causal, scale, block_q)
    return out, (q, k, v, kv_mask)


def _bwd(causal, scale, block_q, residuals, g):
    q, k, v, kv_mask = residuals
    if scale is None:
        scale = q.shape[-1] ** -0.5

    def ref(q, k, v):
        return _xla_reference(q, k, v, kv_mask, causal, scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)


MIN_AUTO_SEQ = 4096


def supports_flash(
    q_shape, k_shape, backend: Optional[str] = None, auto: bool = False
) -> bool:
    """Cheap static check: is the Pallas kernel applicable on this platform?

    ``auto=True`` additionally applies the profitability heuristic. Measured
    crossover on v5e (scripts/bench_flash_crossover.py, Qwen2-0.5B shapes
    B4/N14/KH2/D64, causal+mask, chained-program methodology):

        seq   128   256   512   1024   2048   4096
        x     0.96  1.06  1.01  0.99   0.88   1.70   (XLA time / flash time)

    XLA's batched attention wins or ties everywhere the serving/training
    paths actually operate (80-2048 tokens — the per-grid-cell (T, D) x
    (D, S) matmuls underutilize the 128x128 MXU at D=64 / 2 KV heads, and at
    S=2048 the whole-K/V-resident tile pressures VMEM); the kernel's skipped
    (T, S) logits round trip only dominates from ~4k tokens. Auto therefore
    engages the kernel at >= MIN_AUTO_SEQ; ``flash`` still forces it
    anywhere supported (and raising, never silently degrading, elsewhere —
    ``ops/attention.py``).
    """
    if backend is None:
        backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        return False
    d = q_shape[-1]
    if d % 64 != 0 or d > 256:
        return False
    n, kh = q_shape[2], k_shape[2]
    if n % kh != 0:
        return False
    if auto and (q_shape[1] < MIN_AUTO_SEQ or k_shape[1] < MIN_AUTO_SEQ):
        return False
    return True
