#!/usr/bin/env python
"""Measure the flash-vs-XLA attention crossover (VERDICT r1 #5).

Qwen2-0.5B attention shapes (14 q heads, 2 kv heads, d=64), batch 4, causal
+ key-padding mask. Each impl is chained DEPTH times in one jitted program
with a scalar fetch (tunnel methodology, CLAUDE.md). Feeds the BASELINE.md
crossover table that justifies MIN_AUTO_SEQ.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_ROOT = str(Path(__file__).resolve().parent.parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from vla_fastvlm_tpu.ops.attention import attention

B, N, KH, D = 4, 14, 2, 64
DEPTH = 8
ITERS = 8


def bench(seq: int, impl: str) -> float:
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, seq, N, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, seq, KH, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, seq, KH, D)) * 0.3, jnp.bfloat16)
    mask = np.ones((B, seq), np.int32)
    mask[:, -3:] = 0
    mask = jnp.asarray(mask)

    @jax.jit
    def chained(q, k, v):
        for _ in range(DEPTH):
            out = attention(q, k, v, kv_mask=mask, causal=True, impl=impl)
            q = out.astype(q.dtype)
        return jnp.float32(q.sum())

    float(chained(q, k, v))
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(chained(q, k, v))
        times.append(time.perf_counter() - t0)
    return sorted(times)[ITERS // 2]


def main() -> None:
    print(f"device={jax.devices()[0]} B{B} N{N} KH{KH} D{D} depth{DEPTH}")
    for seq in (128, 256, 512, 1024, 2048, 4096):
        t_x = bench(seq, "xla")
        t_f = bench(seq, "flash")
        print(
            f"seq {seq:5d}: xla {t_x / DEPTH * 1e3:7.2f} ms/op  "
            f"flash {t_f / DEPTH * 1e3:7.2f} ms/op  -> {t_x / t_f:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
