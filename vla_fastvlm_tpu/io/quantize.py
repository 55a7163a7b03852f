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

from ..ops.quant import quantize_kernel

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


def quantize_params(params, names: Iterable[str] = DEFAULT_QUANT_NAMES):
    """Return a copy of ``params`` with matching kernels quantized to int8.

    ``names``: module names whose ``kernel`` (any rank >= 2, so scan-stacked
    ``(L, K, N)`` kernels qualify) is replaced by int8 + per-output scales.
    Biases are kept as-is.
    """
    names = frozenset(names)

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
            out.update(quantize_kernel(node["kernel"]))
            return out
        return {key: walk(value, key) for key, value in node.items()}

    return walk(params, None)


def count_quantized(params) -> int:
    """Number of int8 kernels in the tree (for tests/logging)."""
    count = 0

    def walk(node):
        nonlocal count
        if isinstance(node, dict):
            kernel = node.get("kernel")
            if kernel is not None and getattr(kernel, "dtype", None) is not None:
                if kernel.dtype.kind == "i":
                    count += 1
            for value in node.values():
                walk(value)

    walk(params)
    return count
