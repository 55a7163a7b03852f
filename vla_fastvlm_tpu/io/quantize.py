"""Param-tree transform for weight-only int8 serving (``ops/quant.py``).

Walks a float parameter pytree and replaces the decoder matmul kernels with
``{"kernel": int8, "scale": f32}`` leaves. Works on a bare ``Qwen2ForCausalLM``
tree or on the full FastVLM / FastVLA policy trees (matching is by module
name, and only Qwen2 projection names are touched: the vision tower is
VPU-bound, not weight-bandwidth-bound, and embeddings must stay float for the
gather / tied-logits paths).

The reference has no quantized mode; this is a flag-gated TPU extension (see
``Qwen2Config.quantization``). The transformed tree applies through the same
modules — checkpoints always store float weights, quantization happens at
load/serve time.
"""

from __future__ import annotations

from typing import Iterable

import jax.numpy as jnp

from ..ops.quant import quantize_kernel, quantize_kernel_int4

# Qwen2 decoder matmul param names eligible for weight-only quantization.
DEFAULT_QUANT_NAMES: frozenset = frozenset(
    {
        "q_proj",
        "k_proj",
        "v_proj",
        "o_proj",
        "gate_proj",
        "up_proj",
        "down_proj",
        "lm_head",
    }
)


def quantize_params(
    params,
    names: Iterable[str] = DEFAULT_QUANT_NAMES,
    mode: str = "int8",
    group_size: int | None = None,
):
    """Return a copy of ``params`` with matching kernels quantized.

    ``names``: module names whose ``kernel`` (any rank >= 2, so scan-stacked
    ``(L, K, N)`` kernels qualify) is replaced by the quantized leaf.
    ``mode``: ``"int8"`` (per-output-channel scales) or ``"int4"``
    (per-group scales, 4x fewer weight bytes than bf16 — see
    ``ops/quant.py``). ``"w8a8"`` stores identically to ``"int8"`` (the
    activation half is an apply-time choice, ``ops/quant.py``).
    ``group_size`` overrides the int4 group (default 128). Biases are kept
    as-is.
    """
    names = frozenset(names)
    if mode in ("int8", "w8a8"):
        quantize = quantize_kernel
    elif mode == "int4":
        from ..ops.quant import INT4_GROUP

        g = INT4_GROUP if group_size is None else group_size
        quantize = lambda kernel: quantize_kernel_int4(kernel, g)
    else:
        raise ValueError(f"unknown quantization mode {mode!r}")

    def walk(node, name: str | None):
        if not isinstance(node, dict):
            return node
        if (
            name in names
            and "kernel" in node
            and getattr(node["kernel"], "ndim", 0) >= 2
            # NB: numpy's dtype.kind for bfloat16 is "V", not "f" — use the
            # jnp floating lattice so bf16/f16 param trees quantize too.
            and jnp.issubdtype(node["kernel"].dtype, jnp.floating)
        ):
            out = dict(node)
            out.update(quantize(node["kernel"]))
            return out
        return {key: walk(value, key) for key, value in node.items()}

    return walk(params, None)


def count_quantized(params) -> int:
    """Number of quantized (int8/int4) kernels in the tree."""
    count = 0

    def walk(node):
        nonlocal count
        if isinstance(node, dict):
            kernel = node.get("kernel")
            if kernel is not None and getattr(kernel, "dtype", None) is not None:
                # NB: ml_dtypes int4's numpy kind is "V", not "i" — match the
                # dtype directly.
                if kernel.dtype.kind == "i" or kernel.dtype == jnp.int4:
                    count += 1
            for value in node.values():
                walk(value)

    walk(params)
    return count
