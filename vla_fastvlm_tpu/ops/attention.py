"""Attention ops: XLA reference path plus dispatch to the Pallas flash kernel.

The reference consumes attention indirectly through HF's Qwen2 CUDA kernels
(SURVEY.md 2.2). Here attention is explicit: a masked, GQA-aware
``dot_product_attention`` in pure jnp (exact softmax in fp32) used for parity
tests and CPU runs, with a Pallas TPU flash-attention kernel slotted in for the
jitted hot path (``vla_fastvlm_tpu.ops.pallas.flash_attention``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite: avoids NaN from (-inf) - (-inf) in softmax


def _window_kernel_enabled() -> bool:
    """W > 1 (speculative verify) Pallas dispatch gate — measured OFF.

    The W = 1 decode kernel is measured strictly better at scale (2.7x the
    gathered tick, 4.7x less transient — BASELINE.md). The W > 1 verify
    kernel (round 4) measured a wash-to-loss instead: per-op 0.83-1.07x vs
    the gathered fallback across shapes, and a same-session 0.5B
    spec-paged-server A/B of 1.21x (kernel) vs 1.11x (gathered)
    round-over-tick — the verify gather amortizes over k+1 query tokens,
    so the kernel's one-read-of-pages advantage no longer pays for its
    per-page grid overhead. Gathered stays the default;
    ``FASTVLM_PAGED_WINDOW_KERNEL=1`` opts the kernel in (exactness pinned
    either way, ``tests/test_paged_attention.py``).
    """
    import os

    return os.environ.get("FASTVLM_PAGED_WINDOW_KERNEL", "0") == "1"


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """Expand KV heads for grouped-query attention: (B, S, K, D) -> (B, S, K*n_rep, D)."""
    if n_rep == 1:
        return x
    b, s, k, d = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, k, n_rep, d))
    return x.reshape(b, s, k * n_rep, d)


def make_attention_bias(
    q_positions: jnp.ndarray,  # (B, T) int32 absolute positions of queries
    kv_positions: jnp.ndarray,  # (B, S) int32 absolute positions of keys
    kv_mask: jnp.ndarray,  # (B, S) bool/int — 1 where key is a real token
    causal: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Build an additive attention bias of shape (B, 1, T, S).

    Combines key padding with (optionally) causality by absolute position,
    which works for both prefill (q_positions == kv_positions) and KV-cached
    decode (one query position vs the whole cache).
    """
    allowed = kv_mask[:, None, :].astype(bool)  # (B, 1, S)
    allowed = jnp.broadcast_to(
        allowed[:, None, :, :], (kv_mask.shape[0], 1, q_positions.shape[1], kv_mask.shape[1])
    )
    if causal:
        causal_ok = kv_positions[:, None, None, :] <= q_positions[:, None, :, None]
        allowed = jnp.logical_and(allowed, causal_ok)
    return jnp.where(allowed, jnp.zeros((), dtype), jnp.full((), NEG_INF, dtype))


def dot_product_attention(
    q: jnp.ndarray,  # (B, T, N, D)
    k: jnp.ndarray,  # (B, S, K, D)
    v: jnp.ndarray,  # (B, S, K, D)
    bias: jnp.ndarray | None = None,  # (B, 1, T, S) additive
    scale: float | None = None,
) -> jnp.ndarray:
    """Exact masked attention with fp32 softmax. Returns (B, T, N, D)."""
    n_heads, kv_heads = q.shape[2], k.shape[2]
    if n_heads != kv_heads:
        rep = n_heads // kv_heads
        k = repeat_kv(k, rep)
        v = repeat_kv(v, rep)
    if scale is None:
        scale = q.shape[-1] ** -0.5

    logits = jnp.einsum("btnd,bsnd->bnts", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnts,bsnd->btnd", probs.astype(v.dtype), v)
    return out


def paged_attention(
    q: jnp.ndarray,  # (B, W, N, D) post-RoPE decode/verify queries
    pool_k: jnp.ndarray,  # (P_total, K, page, D) physical page pool
    pool_v: jnp.ndarray,  # (P_total, K, page, D)
    tables: jnp.ndarray,  # (B, P_slot) int32 physical page ids (0 = trash)
    kv_mask: jnp.ndarray,  # (B, S_max) stored-position validity
    lengths: jnp.ndarray,  # (B,) slot write cursor of the current window
    k_new: jnp.ndarray,  # (B, W, K, D) current window K (post-RoPE)
    v_new: jnp.ndarray,  # (B, W, K, D)
    *,
    pool_k_scale: jnp.ndarray | None = None,  # (P_total, K, page) int8 pools
    pool_v_scale: jnp.ndarray | None = None,
    scale: float | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention for a W-token window against a paged KV pool -> (B, W, N, D).

    ``W == 1`` is the decode tick; ``W > 1`` is the speculative verify
    window (``serving/speculative_paged.py``) — window position ``i`` sits
    at slot ``lengths[b] + i`` and may attend the stored pages plus window
    positions ``<= i`` (slot-causal, exactly the dense ``verify_step``
    semantics).

    Dispatch: the Pallas TPU kernel (``ops/pallas/paged_attention.py``;
    ``W == 1`` decode and ``W > 1`` verify windows) reads pages via the
    table inside the kernel (no transient gathered window) — int8 pools
    included, folding the scales into scores/probs in-kernel (pass the
    scale pools); everywhere it does not apply (CPU, ``impl="xla"``) the
    fallback gathers the logical window per layer and reproduces the dense
    decode path's exact op sequence (insert-at-cursor + slot-causal bias),
    so greedy tokens match the gathered server bit-for-bit on the same
    backend. For int8 pools ``k_new``/``v_new`` must be the
    dequant-roundtripped new rows (the caller quantized them for the pool
    scatter), matching the dense int8 path's write-then-read numerics.
    """
    quantized = pool_k_scale is not None
    w = q.shape[1]
    if (w == 1 or _window_kernel_enabled()) and impl in ("auto", "flash"):
        from .pallas.paged_attention import (
            paged_attention_window,
            supports_paged_kernel,
        )

        if supports_paged_kernel(
            pool_k.shape, q.shape[2], pool_k.dtype, has_scales=quantized
        ):
            return paged_attention_window(
                q, pool_k, pool_v, tables, kv_mask, k_new, v_new,
                pool_k_scale=pool_k_scale, pool_v_scale=pool_v_scale,
                scale=scale,
            )

    # XLA fallback: gather window -> insert current rows -> dense decode math.
    p_slot, page = tables.shape[1], pool_k.shape[2]
    s_max = p_slot * page
    b = q.shape[0]

    def gather(pool):
        g = pool[tables]  # (B, P_slot, K, page[, D])
        if pool.ndim == 4:
            g = jnp.transpose(g, (0, 1, 3, 2, 4))  # (B, P_slot, page, K, D)
            return g.reshape(b, s_max, pool.shape[1], pool.shape[3])
        g = jnp.transpose(g, (0, 1, 3, 2))  # scales: (B, P_slot, page, K)
        return g.reshape(b, s_max, pool.shape[1])

    insert = jax.vmap(
        lambda buf, new, idx: jax.lax.dynamic_update_slice(buf, new, (idx, 0, 0))
    )
    if quantized:
        from .quant import dequantize_kv

        win_k = insert(
            dequantize_kv(gather(pool_k), gather(pool_k_scale), q.dtype),
            k_new.astype(q.dtype), lengths,
        )
        win_v = insert(
            dequantize_kv(gather(pool_v), gather(pool_v_scale), q.dtype),
            v_new.astype(q.dtype), lengths,
        )
    else:
        win_k = insert(gather(pool_k), k_new.astype(pool_k.dtype), lengths)
        win_v = insert(gather(pool_v), v_new.astype(pool_v.dtype), lengths)
    kv_mask_upd = jax.vmap(
        lambda row, idx: jax.lax.dynamic_update_slice(
            row, jnp.ones((w,), jnp.int32), (idx,)
        )
    )(kv_mask.astype(jnp.int32), lengths)
    kv_positions = jnp.broadcast_to(
        jnp.arange(s_max, dtype=jnp.int32)[None, :], (b, s_max)
    )
    q_positions = lengths[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]
    bias = make_attention_bias(
        q_positions, kv_positions, kv_mask_upd, causal=True
    )
    return dot_product_attention(
        q, win_k.astype(q.dtype), win_v.astype(q.dtype), bias=bias, scale=scale
    )


def attention(
    q: jnp.ndarray,  # (B, T, N, D)
    k: jnp.ndarray,  # (B, S, K, D)
    v: jnp.ndarray,  # (B, S, K, D)
    *,
    bias: jnp.ndarray | None = None,
    kv_mask: jnp.ndarray | None = None,
    causal: bool = False,
    scale: float | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention entry point with Pallas flash dispatch.

    Two mask interfaces:
    - structured (``kv_mask`` + ``causal``, prefill layout): eligible for the
      fused Pallas TPU kernel (``ops/pallas/flash_attention.py``);
    - additive ``bias`` (arbitrary positions, KV-cache decode): always the
      XLA path. ``impl``: "auto" picks flash on TPU when applicable, "flash"
      forces it where supported, "xla" disables it.
    """
    if bias is None and kv_mask is not None and impl in ("auto", "flash"):
        from .pallas.flash_attention import flash_attention, supports_flash

        if supports_flash(q.shape, k.shape, auto=impl == "auto"):
            return flash_attention(q, k, v, kv_mask, causal, scale)
        if impl == "flash":
            # Forcing must never silently degrade to XLA (VERDICT r1 #5/#6):
            # head_dim not a multiple of 64 (e.g. the vision tower's 32), a
            # non-TPU backend, or ragged head grouping are hard rejections.
            raise ValueError(
                f"attention_impl='flash' forced but q{tuple(q.shape)} / "
                f"k{tuple(k.shape)} on backend {jax.default_backend()!r} is "
                "unsupported by the Pallas flash kernel (requires TPU, "
                "head_dim % 64 == 0, n_heads % kv_heads == 0)"
            )
    # Additive-bias calls (KV-cached layout) are a different algorithm, not a
    # degradation: 'flash' governs the structured prefill layout only.

    if bias is None:
        b, t = q.shape[0], q.shape[1]
        s = k.shape[1]
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        kv_positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        mask = kv_mask if kv_mask is not None else jnp.ones((b, s), jnp.int32)
        bias = make_attention_bias(positions, kv_positions, mask, causal=causal)
    return dot_product_attention(q, k, v, bias=bias, scale=scale)
