"""Weight-only int8/int4 quantization primitives (inference serving mode).

The reference has no quantized path (its serving loop runs eager torch
bf16/fp32, reference ``lerobot_fastvla/modeling_fastvla.py:113-125``); this is
a TPU-native extension: KV-cached decode at small batch is weight-HBM-bandwidth
bound (BASELINE.md: 3330 tokens/sec at batch 16 is set by streaming ~1 GB of
bf16 decoder weights per step), so storing matmul kernels as int8 halves the
bytes each decode step must pull from HBM.

Scheme: symmetric per-output-channel absmax. A float kernel ``(..., K, N)``
becomes ``kernel`` int8 ``(..., K, N)`` + ``scale`` f32 ``(..., 1, N)``. The
matmul computes ``(x @ kernel.astype(compute_dtype)) * scale`` — the int8→bf16
convert fuses into the dot's operand load (no dequantized copy ever hits HBM)
and the per-column scale applies to the output, which commutes with TP row
splits (scale is linear per output column, so scaling partial sums before the
psum equals scaling after).

Quality: int8 per-channel weight-only is the standard "free lunch" point in
the quantization literature (~0.1% quality deltas); a logit-error bound is
pinned in ``tests/test_quantization.py``.

``"w8a8"`` additionally quantizes the *activations* (dynamic per-token
symmetric absmax) and runs the dot as int8 x int8 -> int32 — on v5e the MXU's
int8 path has 2x the bf16 throughput (394.7 TOPS vs 197 TFLOPS), which is the
remaining lever in the compute-bound prefill regime where weight-only
quantization buys nothing (the serving hot loop IS prefill — the north-star
metric). Storage is identical to "int8" (same tree, same converter); only the
apply changes. Dynamic per-token activation scales are the standard
calibration-free w8a8 recipe; real-checkpoint quality depends on activation
outliers (SmoothQuant-style smoothing is the known fix) — end-task evidence
in ``scripts/eval_quant_quality.py``, logit bounds in
``tests/test_quantization.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INT8_MAX = 127.0
INT4_MAX = 7.0
# Group size along the contraction (K) axis for int4 scales. Per-channel
# absmax is too coarse at 4 bits (one outlier row collapses the whole
# column's resolution); per-group-of-128 is the standard w4 recipe and 128
# matches the MXU contraction tile, so the grouped matmul's inner dots stay
# full-width.
INT4_GROUP = 128


def quantize_kernel(kernel) -> dict:
    """Float kernel (..., K, N) -> {"kernel": int8, "scale": f32 (..., 1, N)}.

    Symmetric absmax per output column (last axis), reduced over the input
    axis (-2) only, so scan-stacked kernels (L, K, N) get per-layer
    per-column scales.

    numpy inputs take a pure-numpy path (same math, no device staging) so
    huge trees can quantize host-side before transfer — on a TPU-only
    backend, staging the float 7B tree through jnp would not fit the chip.
    """
    if kernel.ndim < 2:
        raise ValueError(f"expected a matmul kernel (..., K, N), got {kernel.shape}")
    if isinstance(kernel, np.ndarray):
        k32 = np.asarray(kernel, np.float32)
        absmax = np.max(np.abs(k32), axis=-2, keepdims=True)
        scale = np.where(absmax > 0, absmax / INT8_MAX, 1.0)
        q = np.clip(np.round(k32 / scale), -INT8_MAX, INT8_MAX).astype(np.int8)
        return {"kernel": q, "scale": scale.astype(np.float32)}
    k32 = jnp.asarray(kernel, jnp.float32)
    absmax = jnp.max(jnp.abs(k32), axis=-2, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / INT8_MAX, 1.0)
    q = jnp.clip(jnp.round(k32 / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return {"kernel": q, "scale": scale.astype(jnp.float32)}


def quantize_kernel_int4(kernel, group_size: int = INT4_GROUP) -> dict:
    """Float kernel (..., K, N) -> {"kernel": int4, "scale": f32 (..., K/G, N)}.

    Symmetric absmax per (group-of-``G``-input-rows, output column), where
    ``G = gcd(K, group_size)`` — exactly ``group_size`` for every Qwen2
    production shape (hidden/intermediate sizes are multiples of 128), and a
    divisor of K otherwise (tiny test models). Storage is ``jnp.int4`` —
    XLA packs two values per byte in HBM, so a decode step streams 4x fewer
    weight bytes than bf16.

    numpy inputs quantize host-side (same rationale as ``quantize_kernel``:
    a float 7B tree cannot stage through the chip).
    """
    import math

    if kernel.ndim < 2:
        raise ValueError(f"expected a matmul kernel (..., K, N), got {kernel.shape}")
    *lead, K, N = kernel.shape
    group_size = math.gcd(K, group_size)
    kg = K // group_size
    if isinstance(kernel, np.ndarray):
        k32 = np.asarray(kernel, np.float32).reshape(*lead, kg, group_size, N)
        absmax = np.max(np.abs(k32), axis=-2, keepdims=True)
        scale = np.where(absmax > 0, absmax / INT4_MAX, 1.0)
        q = np.clip(np.round(k32 / scale), -INT4_MAX, INT4_MAX)
        import ml_dtypes

        return {
            "kernel": q.reshape(kernel.shape).astype(ml_dtypes.int4),
            "scale": scale[..., 0, :].astype(np.float32),
        }
    k32 = jnp.asarray(kernel, jnp.float32).reshape(*lead, kg, group_size, N)
    absmax = jnp.max(jnp.abs(k32), axis=-2, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / INT4_MAX, 1.0)
    q = jnp.clip(jnp.round(k32 / scale), -INT4_MAX, INT4_MAX)
    q8 = q.reshape(kernel.shape).astype(jnp.int8)
    return {
        "kernel": _concrete_to_int4(q8),
        "scale": scale[..., 0, :].astype(jnp.float32),
    }


def _concrete_to_int4(q8):
    """int8 nibbles -> s4, keeping the canonical-layout invariant.

    Under a trace, or on CPU backends (no tiled layouts), a plain ``astype``
    is correct. A *concrete* array on a TPU-class backend must NOT go
    through eager ``astype``: XLA picks an arbitrary s4 layout there, and
    jax 0.9 can never relayout an s4 array afterwards (``device.py``'s
    staging note) — every device s4 array in this codebase is required to
    be in the canonical packed Format. Route those through the same
    Format-pinned cast ``device.place_params`` uses.
    """
    import jax

    if isinstance(q8, jax.core.Tracer) or not isinstance(q8, jax.Array):
        return q8.astype(jnp.int4)
    if all(d.platform == "cpu" for d in q8.devices()):
        return q8.astype(jnp.int4)
    from ..device import _int4_caster

    device = next(iter(q8.devices()))
    return _int4_caster(q8.ndim, jax.sharding.SingleDeviceSharding(device))(q8)


# Token count at which the int4 matmul switches from the grouped (decode)
# formulation to the fused-dequant (prefill) one. Measured on v5e (24
# distinct 3584^2 kernels scanned in one program, RTT subtracted): grouped
# wins at M=16 (0.09 vs 0.15 ms — weight-streaming-bound), the two tie at
# M=256-768, and fused-dequant is 2.1x faster at M=2048 (0.28 vs 0.61 ms =
# ~95% of bf16 MXU peak). The gap widens at MLP shapes where the grouped
# partial-sum buffer (M x K/G x N) dwarfs the weight itself.
INT4_DEQUANT_MIN_TOKENS = 256

# Token count at which "w8a8" actually engages the int8 x int8 MXU dot;
# below it the apply silently falls back to the weight-only int8 matmul.
# Measured on v5e (chained dots, RTT subtracted): at M=768 the per-layer
# net is a wash (gate_up 7B 1.45x but qkv 0.56x — the per-token quantize +
# int32->f32 rescale overheads beat the MXU win on skinny/narrow dots); at
# M>=2048 the dominant MLP matmuls win outright (1.96x vs bf16 at M=8192,
# 360 of 394 peak TOPS). Decode (M=batch) therefore always takes the
# weight-only path, which is optimal there (weight-streaming-bound).
W8A8_MIN_TOKENS = 1024


def _int4_matmul(x: jnp.ndarray, kernel, scale, dtype) -> jnp.ndarray:
    """x @ dequant(kernel) with per-(group, column) scales, no HBM dequant.

    Two formulations, chosen statically at trace time by token count
    (shapes are static under jit, so this compiles to exactly one):

    - **grouped** (decode, tokens < ``INT4_DEQUANT_MIN_TOKENS``): the dot
      splits into K/G partial dots of contraction G; each partial output
      picks up its group's scale before the sum over groups. The int4->bf16
      convert feeds the dot operand directly and scales apply to
      (..., K/G, N) partial sums — a dequantized copy of the weights never
      materializes, preserving the 4x weight-bandwidth win that pays when
      the matmul is weight-streaming-bound.
    - **fused-dequant** (prefill): scale the converted weights elementwise
      and run ONE dot_general contracting BOTH the group and in-group dims
      (``...gk,gkn->...n``). XLA fuses the dequant into the dot operand (no
      HBM copy; measured 1.35-2.1x grouped at M=2048 depending on shape),
      avoiding the grouped path's (..., K/G, N) partial-sum traffic that
      dominates in the compute-bound regime. Deliberately NOT expressed as
      ``x @ w.reshape(K, N)``: reshaping the scaled weights back to (K, N)
      makes XLA's layout assignment drop the parameter's sub-byte entry
      layout annotation (wants E(0) instead of E(4)), and dispatching a
      canonically-staged s4 array into such an executable triggers the jax
      s4 relayout RecursionError (``device.py``). The two-contracting-dims
      einsum keeps the weight-side op chain identical to grouped's
      (convert + reshape + multiply), preserves the canonical entry layout,
      and measured within 1% of the reshape formulation's speed.
    """
    if kernel.ndim != 2:
        raise ValueError(
            "int4 apply expects a per-layer (K, N) kernel (scan-stacked "
            f"trees slice per step), got {kernel.shape}"
        )
    K, N = kernel.shape
    kg = scale.shape[-2]
    group = K // kg
    tokens = int(np.prod(x.shape[:-1]))
    xg = x.astype(dtype).reshape(x.shape[:-1] + (kg, group))
    qg = kernel.astype(dtype).reshape(kg, group, N)
    if tokens >= INT4_DEQUANT_MIN_TOKENS:
        w = qg * scale.astype(dtype)[:, None, :]
        return jnp.einsum("...gk,gkn->...n", xg, w)
    partial = jnp.einsum("...gk,gkn->...gn", xg, qg)
    return (partial * scale.astype(dtype)).sum(axis=-2)


def quantize_activations(x: jnp.ndarray) -> tuple:
    """(..., K) float -> (int8 (..., K), f32 (..., 1) scales).

    Dynamic symmetric absmax per row (= per token for (B, T, K) hidden
    states) — computed inside the jitted program every step, no calibration
    pass. Row granularity is what w8a8 needs: the quantized dot's output
    rescales by ``x_scale * w_scale`` with both factors outside the
    contraction, and per-row is the finest granularity that stays outside.
    """
    x32 = jnp.asarray(x, jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / INT8_MAX, 1.0)
    q = jnp.clip(jnp.round(x32 / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def _int8_matmul_w8a8(x: jnp.ndarray, kernel, wscale, dtype) -> jnp.ndarray:
    """x @ dequant(kernel) computed as an int8 x int8 -> int32 MXU dot.

    ``round(x/sx) @ q`` accumulates in int32 (exact: |acc| <= 127*127*K
    < 2^31 for every K <= 133k, far above Qwen2-7B's 18944), then rescales
    by the per-row activation scale and per-column weight scale in f32.
    Under TP contraction splits each shard quantizes its own activation
    slice with its own scale — per-shard rescale-then-psum equals the
    unsharded product because the scales sit outside each shard's dot.
    """
    if kernel.ndim != 2:
        raise ValueError(
            "w8a8 apply expects a per-layer (K, N) kernel (scan-stacked "
            f"trees slice per step), got {kernel.shape}"
        )
    if int(np.prod(x.shape[:-1])) < W8A8_MIN_TOKENS:
        # Below the measured crossover the activation-quant overheads beat
        # the MXU int8 win — fall back to the weight-only int8 matmul
        # (optimal for decode, which is weight-streaming-bound). Static
        # shapes under jit: this compiles to exactly one of the two.
        y = x.astype(dtype) @ kernel.astype(dtype)
        return y * jnp.asarray(wscale, jnp.float32).astype(dtype)
    xq, xscale = quantize_activations(x)
    acc = jax.lax.dot_general(
        xq,
        kernel,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xscale * jnp.asarray(wscale, jnp.float32)
    return y.astype(dtype)


def dense_apply(x: jnp.ndarray, leaf: dict, dtype, act_quant: bool = False) -> jnp.ndarray:
    """Apply a maybe-quantized Dense param leaf: x @ W (+ bias).

    ``leaf`` is a param subtree ``{"kernel", ["scale"], ["bias"]}``; the int8
    branch computes ``(x @ q) * scale`` in ``dtype``. ``act_quant`` upgrades
    int8 kernels to the w8a8 MXU path (``_int8_matmul_w8a8``).
    """
    kernel = leaf["kernel"]
    if kernel.dtype == jnp.int8:
        if act_quant:
            y = _int8_matmul_w8a8(x, kernel, leaf["scale"], dtype)
        else:
            y = x.astype(dtype) @ kernel.astype(dtype)
            y = y * leaf["scale"].astype(dtype)
    elif kernel.dtype == jnp.int4:
        y = _int4_matmul(x, kernel, leaf["scale"], dtype)
    else:
        y = x.astype(dtype) @ kernel.astype(dtype)
    bias = leaf.get("bias")
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def quantize_kv(x: jnp.ndarray) -> tuple:
    """(..., D) float K/V values -> (int8 values, (...,) f32 scales).

    Symmetric absmax over the head dim: one scale per (position, kv head),
    the granularity KV magnitudes actually vary at (RoPE rotates within the
    head; RMSNorm bounds the projections).
    """
    x32 = jnp.asarray(x, jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / INT8_MAX, 1.0)
    q = jnp.clip(jnp.round(x32 / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.float32)


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """Inverse of ``quantize_kv``: int8 (..., D) + (...,) scales -> dtype."""
    return q.astype(dtype) * scale[..., None].astype(dtype)


def fused_dense_apply(
    x: jnp.ndarray, leaves: list, dtype, act_quant: bool = False
) -> jnp.ndarray:
    """One matmul over column-concatenated projection kernels.

    The fused-projection optimization (Qwen2Config.fused_projections): the
    separate k/v and gate/up dots underutilize the 128-lane MXU, so the
    kernels concatenate along the output axis at apply time. For quantized
    leaves the concatenation stays **int8** (scales are per output column, so
    they concatenate alongside) — dequantizing before the concat would write
    a bf16 copy of the weights to HBM every step and forfeit the bandwidth
    win. Mixed quantized/float groups are rejected.

    Biases: leaves may carry "bias" (all or none).
    """
    kinds = {
        "int8" if leaf["kernel"].dtype == jnp.int8
        else "int4" if leaf["kernel"].dtype == jnp.int4
        else "float"
        for leaf in leaves
    }
    if len(kinds) > 1:
        raise ValueError(
            f"fused projection group mixes kernel kinds {sorted(kinds)}"
        )
    kind = kinds.pop()
    kcat = jnp.concatenate([leaf["kernel"] for leaf in leaves], axis=-1)
    if kind == "int8":
        scale = jnp.concatenate([leaf["scale"] for leaf in leaves], axis=-1)
        if act_quant:
            y = _int8_matmul_w8a8(x, kcat, scale, dtype)
        else:
            y = x.astype(dtype) @ kcat.astype(dtype)
            y = y * scale.astype(dtype)
    elif kind == "int4":
        # scales are (..., K/G, N_i): output-column concat composes the same
        # way the kernels do.
        scale = jnp.concatenate([leaf["scale"] for leaf in leaves], axis=-1)
        y = _int4_matmul(x, kcat, scale, dtype)
    else:
        y = x.astype(dtype) @ kcat.astype(dtype)
    if "bias" in leaves[0]:
        bcat = jnp.concatenate([leaf["bias"] for leaf in leaves], axis=-1)
        y = y + bcat.astype(dtype)
    return y
