"""Pallas TPU paged-attention kernel (decode + speculative verify windows).

Closes the paged server's declared seam (``serving/paged_kv.py``): the
XLA-gathered decode tick materializes each slot's logical ``(L, B, S, K, D)``
window out of the page pool every tick — at least three full-window HBM
round trips (gather read+write, attention read) plus the scanned decode
program's stacked new-window outputs. This kernel reads K/V **pages directly
from the pool via the page table inside the kernel**, so a decode tick's
attention traffic is one read of the allocated pages and nothing else.

Design (see /opt/skills/guides/pallas_guide.md):

- grid = (batch_slot, pages_per_slot); the page table rides in as a
  **scalar-prefetch** operand (``pltpu.PrefetchScalarGridSpec``) so the
  BlockSpec index maps resolve ``table[b, p]`` to a physical pool page
  *before* the kernel body runs — the pipeline machinery then streams and
  double-buffers page blocks exactly like any other blocked operand.
- Pool layout is ``(num_pages, K, page, D)`` per layer (kv-head major), so a
  page block's trailing dims are ``(page, D)`` — sublane/lane aligned for
  bf16 at ``page_size`` >= 16 without relayout.
- Each grid step stages its page into a per-slot VMEM window scratch
  ``(K, S_max, D)``; the last page step runs the whole (tiny) GQA attention
  for that slot in fp32: one ``(rep, S)`` logits tile per kv head — never
  materialized to HBM.
- The current token's K/V (``k_new``/``v_new``, this tick's projections)
  enter as separate operands and join the softmax as one extra column, so
  the kernel never depends on the pool scatter having happened first — the
  server scatters the row *after* the tick, exactly like the gathered path.
- Decode attention is HBM-bandwidth-bound (q is one token); compute shape
  inefficiency (rep x page matmuls) is irrelevant by construction — the
  kernel's job is to touch each allocated byte once.

int8 pools (``kv_cache_quantization="int8"``) run through the same kernel
shape: pages stage as a pure int8->float convert and the per-(position,
kv-head) scales — gathered into per-slot windows outside the kernel — fold
into the attention scores/probabilities, so the attention HBM read is half
the bf16 kernel's bytes with no per-page scale DMAs.

The mathematically-identical XLA fallback (gather + insert + dense
attention) lives in ``ops/attention.paged_attention`` and is used on CPU;
numerics between kernel and fallback differ only in summation order of the
softmax (the appended current-token column), pinned by
``tests/test_paged_attention.py`` in interpreter mode.

No reference counterpart: the reference has no serving path at all
(``lerobot_fastvla/modeling_fastvla.py:113-125`` is one eager forward per
env step); this is TPU-native serving infrastructure in the vLLM lineage
(PAPERS.md: paged attention), built on the validated flash-attention kernel
patterns (``ops/pallas/flash_attention.py``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _paged_attn_kernel(
    tables_ref,  # scalar prefetch: (B, P_slot) int32 physical page ids
    q_ref,  # (1, K, rep, D) grouped queries for slot b
    kpage_ref,  # (1, K, page, D) one physical K page
    vpage_ref,  # (1, K, page, D) one physical V page
    mask_ref,  # (1, 1, S_max) int32 validity of stored positions
    knew_ref,  # (1, K, D) current token's K
    vnew_ref,  # (1, K, D) current token's V
    o_ref,  # (1, K, rep, D)
    k_buf,  # VMEM scratch (K, S_max, D)
    v_buf,  # VMEM scratch (K, S_max, D)
    *,
    scale: float,
    page: int,
    kv_heads: int,
    window: int = 1,
):
    p = pl.program_id(1)

    # Stage this page into the slot's window scratch. The offset is a
    # multiple of the page size (static grid step x page).
    off = pl.multiple_of(p * page, page)
    k_buf[:, pl.ds(off, page), :] = kpage_ref[0]
    v_buf[:, pl.ds(off, page), :] = vpage_ref[0]

    _attend_last_page(
        q_ref, mask_ref, knew_ref, vnew_ref, o_ref, k_buf, v_buf,
        scale=scale, kv_heads=kv_heads, window=window,
    )


def _paged_attn_kernel_int8(
    tables_ref,  # scalar prefetch: (B, P_slot) int32 physical page ids
    q_ref,  # (1, K, rep, D) grouped queries for slot b
    kpage_ref,  # (1, K, page, D) one physical int8 K page
    vpage_ref,  # (1, K, page, D) one physical int8 V page
    kscale_ref,  # (1, K, S_max) per-(kv head, position) K scale WINDOW
    vscale_ref,  # (1, K, S_max) per-(kv head, position) V scale WINDOW
    mask_ref,  # (1, 1, S_max) int32 validity of stored positions
    knew_ref,  # (1, K, D) current token's K (already dequant-roundtripped)
    vnew_ref,  # (1, K, D) current token's V
    o_ref,  # (1, K, rep, D)
    k_buf,  # VMEM scratch (K, S_max, D), float
    v_buf,  # VMEM scratch (K, S_max, D), float
    *,
    scale: float,
    page: int,
    kv_heads: int,
    window: int = 1,
):
    """int8-pool variant: pages stage as a pure int8->float convert (int8
    magnitudes are exact in bf16) and the per-(position, kv-head) scales —
    ``ops/quant.quantize_kv`` granularity — fold into the attention math
    instead of the staged values: ``q . (s*k) = s * (q . k)`` scales the
    score columns, ``sum_i p_i (s_i v_i) = sum_i (p_i s_i) v_i`` scales the
    probabilities. The scales arrive as per-slot windows gathered OUTSIDE
    the kernel (a few hundred KB of XLA gather), loaded once per slot like
    the mask — NOT per page: a (K, page) f32 scale block is ~128 bytes, and
    one extra DMA pair per grid program measurably dominated the first
    version of this kernel (~4 ms of the 19 ms tick at 64 slots x 528).
    int8 pools thus keep the one-read-of-allocated-pages traffic story AND
    halve the bytes of that one read."""
    p = pl.program_id(1)

    off = pl.multiple_of(p * page, page)
    k_buf[:, pl.ds(off, page), :] = kpage_ref[0].astype(k_buf.dtype)
    v_buf[:, pl.ds(off, page), :] = vpage_ref[0].astype(v_buf.dtype)

    _attend_last_page(
        q_ref, mask_ref, knew_ref, vnew_ref, o_ref, k_buf, v_buf,
        scale=scale, kv_heads=kv_heads, window=window,
        kscale_ref=kscale_ref, vscale_ref=vscale_ref,
    )


def _attend_last_page(
    q_ref, mask_ref, knew_ref, vnew_ref, o_ref, k_buf, v_buf,
    *, scale: float, kv_heads: int, window: int = 1,
    kscale_ref=None, vscale_ref=None,
):
    p = pl.program_id(1)

    @pl.when(p == pl.num_programs(1) - 1)
    def _attend():
        valid = mask_ref[0, 0, :] > 0  # (S_max,)
        for h in range(kv_heads):  # static unroll: K is 2 (0.5B) or 4 (7B)
            # window == 1 (decode tick): qh is (rep, D), knew/vnew (D,).
            # window == W > 1 (speculative verify): qh is (W*rep, D) laid out
            # window-major (row = w_i*rep + r_i), knew/vnew (W, D); window
            # column j is valid for query row i iff j <= i // rep
            # (slot-causal among the new tokens; stored pages are all strictly
            # older than every window position, so ``valid`` covers them).
            qh = q_ref[0, h].astype(jnp.float32)  # (W*rep, D)
            logits = jax.lax.dot_general(
                qh,
                k_buf[h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (W*rep, S_max)
            if kscale_ref is not None:  # int8 pool: fold K scales into scores
                logits = logits * kscale_ref[0, h][None, :].astype(jnp.float32)
            logits = jnp.where(valid[None, :], logits, NEG_INF)
            # Current window: always-valid (causally masked) extra columns,
            # kept out of the stored window so the kernel does not require
            # the pool scatter to have happened first.
            k_new = knew_ref[0, h].astype(jnp.float32)  # (D,) or (W, D)
            if window == 1:
                l_new = (
                    jnp.sum(qh * k_new[None, :], axis=1, keepdims=True) * scale
                )  # (rep, 1)
            else:
                rep = qh.shape[0] // window
                l_new = jax.lax.dot_general(
                    qh, k_new,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # (W*rep, W)
                row_win = (
                    jax.lax.broadcasted_iota(jnp.int32, l_new.shape, 0) // rep
                )
                col = jax.lax.broadcasted_iota(jnp.int32, l_new.shape, 1)
                l_new = jnp.where(col <= row_win, l_new, NEG_INF)
            m = jnp.maximum(
                jnp.max(logits, axis=1, keepdims=True),
                jnp.max(l_new, axis=1, keepdims=True),
            )
            ea = jnp.exp(logits - m)  # (W*rep, S_max); masked cols exp(-inf)=0
            eb = jnp.exp(l_new - m)  # (W*rep, W)
            denom = jnp.sum(ea, axis=1, keepdims=True) + jnp.sum(
                eb, axis=1, keepdims=True
            )
            probs = ea / denom
            if vscale_ref is not None:  # int8 pool: fold V scales into probs
                probs = probs * vscale_ref[0, h][None, :].astype(jnp.float32)
            probs = probs.astype(v_buf.dtype)
            pv = jax.lax.dot_general(
                probs,
                v_buf[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (W*rep, D)
            v_new = vnew_ref[0, h].astype(jnp.float32)
            if window == 1:
                out = pv + (eb / denom) * v_new[None, :]
            else:
                out = pv + jax.lax.dot_general(
                    (eb / denom).astype(v_new.dtype), v_new,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[0, h] = out.astype(o_ref.dtype)


def paged_attention_decode(
    q: jnp.ndarray,  # (B, N, D) post-RoPE queries, one token per slot
    pool_k: jnp.ndarray,  # (P_total, K, page, D)
    pool_v: jnp.ndarray,  # (P_total, K, page, D)
    tables: jnp.ndarray,  # (B, P_slot) int32 physical page ids (0 = trash)
    kv_mask: jnp.ndarray,  # (B, S_max) stored-position validity
    k_new: jnp.ndarray,  # (B, K, D) current token K (post-RoPE)
    v_new: jnp.ndarray,  # (B, K, D)
    *,
    pool_k_scale: Optional[jnp.ndarray] = None,  # (P_total, K, page) int8 pools
    pool_v_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One decode step of attention against a paged KV pool -> (B, N, D).

    With ``pool_k_scale``/``pool_v_scale`` the pools are int8
    (``kv_cache_quantization="int8"``): pages dequantize while staging into
    the float window scratch, so the attention HBM read is HALF the bf16
    kernel's bytes. ``k_new``/``v_new`` must arrive already
    dequant-roundtripped (the model quantizes the new row for the pool
    scatter and hands the kernel its dequantized value, matching the
    gathered path's write-then-read numerics).
    """
    out = paged_attention_window(
        q[:, None], pool_k, pool_v, tables, kv_mask,
        k_new[:, None], v_new[:, None],
        pool_k_scale=pool_k_scale, pool_v_scale=pool_v_scale,
        scale=scale, interpret=interpret,
    )
    return out[:, 0]


def paged_attention_window(
    q: jnp.ndarray,  # (B, W, N, D) post-RoPE queries, W tokens per slot
    pool_k: jnp.ndarray,  # (P_total, K, page, D)
    pool_v: jnp.ndarray,  # (P_total, K, page, D)
    tables: jnp.ndarray,  # (B, P_slot) int32 physical page ids (0 = trash)
    kv_mask: jnp.ndarray,  # (B, S_max) stored-position validity
    k_new: jnp.ndarray,  # (B, W, K, D) current window K (post-RoPE)
    v_new: jnp.ndarray,  # (B, W, K, D)
    *,
    pool_k_scale: Optional[jnp.ndarray] = None,  # (P_total, K, page) int8 pools
    pool_v_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """W-token window attention against a paged KV pool -> (B, W, N, D).

    ``W == 1`` is the decode tick; ``W > 1`` is the speculative verify
    window (``serving/speculative_paged.py``): window position ``i`` sits at
    slot position ``length + i`` and attends the stored pages plus window
    positions ``<= i`` (slot-causal — the new rows join the softmax as
    causally-masked extra columns, so the kernel never depends on the pool
    scatter having happened first). Requires the server invariant that
    ``kv_mask`` only marks positions strictly below every window position
    (masks are rolled back together with lengths on speculative rejection).
    int8-pool semantics as in ``paged_attention_decode``.
    """
    b, w, n, d = q.shape
    p_total, kv_heads, page, _ = pool_k.shape
    p_slot = tables.shape[1]
    s_max = p_slot * page
    rep = n // kv_heads
    if scale is None:
        scale = d ** -0.5
    quantized = pool_k_scale is not None

    if w == 1:
        # Exactly the decode tick's historical operand shapes (measured
        # production path — BASELINE.md paged tables): no window axis.
        q_g = q[:, 0].reshape(b, kv_heads, rep, d)
        knew_op, vnew_op = k_new[:, 0], v_new[:, 0]
        knew_block = (1, kv_heads, d)
    else:
        # Window-major row layout per kv head: row = w_i * rep + r_i
        # (matches the in-kernel ``// rep`` causal index math).
        q_g = jnp.transpose(
            q.reshape(b, w, kv_heads, rep, d), (0, 2, 1, 3, 4)
        ).reshape(b, kv_heads, w * rep, d)
        knew_op = jnp.transpose(k_new, (0, 2, 1, 3))  # (B, K, W, D)
        vnew_op = jnp.transpose(v_new, (0, 2, 1, 3))
        knew_block = (1, kv_heads, w, d)
    # Rank-3 mask so the VMEM block's sublane dim equals the array dim
    # (Mosaic tiling: block dims must be 8/128-multiples OR full-dim; a
    # (1, S) block of a (B, S) array fails the sublane rule).
    mask_i = kv_mask.astype(jnp.int32)[:, None, :]

    page_spec = pl.BlockSpec(
        (1, kv_heads, page, d),
        lambda bi, pi, tab: (tab[bi, pi], 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # Scales load as per-slot windows (gathered below, ~KBs), once per slot
    # like the mask — a per-page (K, page) f32 block would be ~128 bytes
    # and its DMA-per-program latency measurably dominates (see kernel doc).
    scale_spec = pl.BlockSpec(
        (1, kv_heads, s_max),
        lambda bi, pi, tab: (bi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    new_spec = pl.BlockSpec(
        knew_block,
        (lambda bi, pi, tab: (bi, 0, 0))
        if len(knew_block) == 3
        else (lambda bi, pi, tab: (bi, 0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec(
            (1, kv_heads, w * rep, d),
            lambda bi, pi, tab: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        page_spec,
        page_spec,
    ]
    if quantized:
        in_specs += [scale_spec, scale_spec]
    in_specs += [
        pl.BlockSpec(
            (1, 1, s_max),
            lambda bi, pi, tab: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        new_spec,
        new_spec,
    ]
    scratch_dtype = q.dtype if quantized else pool_k.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, p_slot),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, kv_heads, w * rep, d),
            lambda bi, pi, tab: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((kv_heads, s_max, d), scratch_dtype),
            pltpu.VMEM((kv_heads, s_max, d), scratch_dtype),
        ],
    )

    operands = [tables.astype(jnp.int32), q_g, pool_k, pool_v]
    if quantized:
        # Gather each slot's scale window in XLA outside the kernel: the
        # result is (B, K, S_max) f32 — a few hundred KB — read once per
        # slot inside the kernel and folded into scores/probs there.
        def scale_window(scale_pool):  # (P_total, K, page) -> (B, K, S_max)
            g = scale_pool[tables]  # (B, P_slot, K, page)
            g = jnp.transpose(g, (0, 2, 1, 3))
            return g.reshape(b, kv_heads, s_max).astype(jnp.float32)

        operands += [scale_window(pool_k_scale), scale_window(pool_v_scale)]
    operands += [mask_i, knew_op, vnew_op]
    out = pl.pallas_call(
        functools.partial(
            _paged_attn_kernel_int8 if quantized else _paged_attn_kernel,
            scale=scale,
            page=page,
            kv_heads=kv_heads,
            window=w,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv_heads, w * rep, d), q.dtype),
        interpret=interpret,
    )(*operands)
    if w == 1:
        return out.reshape(b, 1, n, d)
    return jnp.transpose(
        out.reshape(b, kv_heads, w, rep, d), (0, 2, 1, 3, 4)
    ).reshape(b, w, n, d)


def supports_paged_kernel(
    pool_k_shape,
    n_heads: int,
    dtype,
    backend: Optional[str] = None,
    has_scales: bool = False,
) -> bool:
    """Static applicability check for the Pallas paged-decode kernel.

    Requirements: TPU backend, ``head_dim % 64 == 0``, whole kv-head
    grouping, and a sublane-aligned page size (>= 16 covers the bf16 tile
    minimum). int8 pools are supported when their per-position scale pools
    ride along (``has_scales``); a bare int8 pool has no dequant story and
    takes the XLA-gather fallback.
    """
    if backend is None:
        backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        return False
    _, kv_heads, page, d = pool_k_shape
    if dtype == jnp.int8 and not has_scales:
        return False
    if d % 64 != 0 or d > 256:
        return False
    if n_heads % kv_heads != 0:
        return False
    if page % 16 != 0:
        return False
    return True
