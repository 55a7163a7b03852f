#!/usr/bin/env python
"""Validate the Pallas flash-attention kernel on real TPU hardware.

The kernel's numerics are pinned in interpreter mode by the test suite; this
script compiles and runs the same kernel on the actual chip and compares
against the XLA reference path — catching Mosaic lowering issues the
interpreter cannot.
"""

from __future__ import annotations

import sys
from pathlib import Path

_ROOT = str(Path(__file__).resolve().parent.parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import jax.numpy as jnp
import numpy as np

from vla_fastvlm_tpu.ops.pallas.flash_attention import (
    _xla_reference,
    flash_attention,
)


def check(b, t, s, n, kh, d, causal, dtype, atol):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, n, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, kh, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, kh, d)), dtype)
    mask = np.ones((b, s), np.int32)
    mask[:, -2:] = 0
    out = np.asarray(
        flash_attention(q, k, v, jnp.asarray(mask), causal), np.float32
    )
    ref = np.asarray(
        _xla_reference(q, k, v, jnp.asarray(mask), causal, d**-0.5), np.float32
    )
    err = np.abs(out - ref).max()
    status = "OK" if err < atol else "FAIL"
    print(
        f"[{status}] b={b} t={t} s={s} n={n} kh={kh} d={d} causal={causal} "
        f"{np.dtype(np.float32).name if dtype == jnp.float32 else 'bf16'}: "
        f"max err {err:.3e}"
    )
    return err < atol


def main():
    cases = [
        # Qwen2-0.5B prefill shape: 80 tokens, 14 q heads, 2 kv heads, d 64.
        # fp32 tolerance reflects TPU default matmul precision (bf16 passes):
        # kernel and reference reduce in different orders.
        (2, 80, 80, 14, 2, 64, True, jnp.float32, 1e-3),
        (2, 80, 80, 14, 2, 64, True, jnp.bfloat16, 3e-2),
        # Longer sequence, block-q tiling kicks in
        (1, 320, 320, 14, 2, 64, True, jnp.bfloat16, 3e-2),
        # Non-causal full attention (vision-style) with d=128
        (1, 256, 256, 8, 8, 128, False, jnp.bfloat16, 3e-2),
    ]
    ok = all([check(*case) for case in cases])
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
