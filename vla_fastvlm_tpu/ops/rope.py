"""Rotary position embeddings, matching HF's default Qwen2 RoPE.

``inv_freq = 1 / theta**(2i/d)``; angles are ``position * inv_freq`` duplicated
across both halves of the head dim, applied as ``x*cos + rotate_half(x)*sin``
with ``rotate_half([x1, x2]) = [-x2, x1]``. Computed in float32 for parity with
HF (which builds cos/sin in float32) before casting to the activation dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(
    positions: jnp.ndarray,  # (B, T) or (T,) int32
    head_dim: int,
    theta: float = 1_000_000.0,
    dtype: jnp.dtype = jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin), each of shape positions.shape + (head_dim,)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., d/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (..., d)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,  # (B, T, N, D)
    k: jnp.ndarray,  # (B, T, K, D)
    cos: jnp.ndarray,  # (B, T, D) or (T, D)
    sin: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding to query/key tensors laid out (B, T, heads, D)."""
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]
    q_out = q * cos + _rotate_half(q) * sin
    k_out = k * cos + _rotate_half(k) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
