"""Normalization ops.

Numerics follow HF Qwen2RMSNorm / torch LayerNorm so that weights exported from
torch checkpoints reproduce identical features (the reference consumes these
inside the HF backbone it loads at ``fastvlm_adapter.py:185-191``). All
reductions run in float32 regardless of input dtype; XLA fuses the casts into
the surrounding computation and the output is cast back to the input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Root-mean-square layer norm: ``x * rsqrt(mean(x^2) + eps) * weight``."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Standard layer norm with optional affine, fp32 internal math."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
