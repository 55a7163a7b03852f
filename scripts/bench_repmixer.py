"""On-chip benchmark: fused RepMixer Pallas kernel vs unfused XLA composition.

Methodology per CLAUDE.md tunnel rules: chain DEPTH blocks inside ONE jitted
program (cross-call chaining is elided on the tunneled backend) and fetch a
scalar at the end; report per-block time. Also asserts on-chip numerical
agreement between the two paths.

Usage: python scripts/bench_repmixer.py [--dtype bfloat16] [--iters 10]
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path

_ROOT = str(Path(__file__).resolve().parent.parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


@dataclass
class Args:
    dtype: str = "bfloat16"
    iters: int = 10
    depth: int = 12
    check: bool = True
    device: str = ""  # "" = default (TPU); "cpu" for local smoke


def main(args: Args) -> None:
    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from vla_fastvlm_tpu.ops.pallas.repmixer import (
        _plan,
        _repmixer_block_pallas,
        _repmixer_block_xla,
    )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    print(f"[bench_repmixer] device={jax.devices()[0]} dtype={args.dtype}",
          file=sys.stderr)

    # (label, B, H, W, C, hidden, depth) — flagship 1024px stage shapes and
    # the 256px bench config's stage1.
    cases = [
        ("stage1@1024px", 16, 128, 128, 192, 768, args.depth),
        ("stage2@1024px", 16, 64, 64, 384, 1536, min(args.depth, 24)),
        ("stage1@256px-b128", 128, 32, 32, 192, 768, args.depth),
    ]

    for label, b, h, w, c, f, depth in cases:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, h, w, c)) * 0.5, dtype)
        w3 = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.1, dtype)
        b3 = jnp.asarray(rng.standard_normal(c) * 0.1, dtype)
        w7 = jnp.asarray(rng.standard_normal((7, 7, 1, c)) * 0.05, dtype)
        b7 = jnp.asarray(rng.standard_normal(c) * 0.1, dtype)
        w1 = jnp.asarray(rng.standard_normal((c, f)) * c ** -0.5, dtype)
        b1 = jnp.asarray(rng.standard_normal(f) * 0.1, dtype)
        w2 = jnp.asarray(rng.standard_normal((f, c)) * f ** -0.5, dtype)
        b2 = jnp.asarray(rng.standard_normal(c) * 0.1, dtype)
        g = jnp.asarray(rng.standard_normal(c) * 0.01, dtype)
        weights = (w3, b3, w7, b7, w1, b1, w2, b2, g)

        def chain(block):
            def fn(x, *wts):
                for _ in range(depth):
                    x = block(x, *wts)
                return jnp.float32(x.sum())

            return jax.jit(fn)

        fused = chain(_repmixer_block_pallas)
        unfused = chain(_repmixer_block_xla)

        def run(fn):
            t0 = time.perf_counter()
            out = float(fn(x, *weights))  # host fetch = sync
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                float(fn(x, *weights))
                times.append(time.perf_counter() - t0)
            return out, compile_s, sorted(times)[len(times) // 2]

        out_f, comp_f, t_f = run(fused)
        out_u, comp_u, t_u = run(unfused)
        per_block_f = t_f / depth * 1e3
        per_block_u = t_u / depth * 1e3
        print(
            f"[bench_repmixer] {label} (B{b} {h}x{w}x{c} f{f} depth{depth}, "
            f"plan={_plan(h, w, c, f)}): fused {t_f * 1e3:.1f} ms "
            f"({per_block_f:.2f} ms/blk), xla {t_u * 1e3:.1f} ms "
            f"({per_block_u:.2f} ms/blk) -> {t_u / t_f:.2f}x "
            f"(compile {comp_f:.0f}s/{comp_u:.0f}s)"
        )
        if args.check:
            # scalar sums over ~10^6 bf16 values: loose relative check; the
            # exactness contract is the interpreter test suite.
            rel = abs(out_f - out_u) / max(abs(out_u), 1e-6)
            print(f"[bench_repmixer] {label} sums {out_f:.1f} vs {out_u:.1f} "
                  f"(rel {rel:.2e})")


if __name__ == "__main__":
    from vla_fastvlm_tpu.utils.cli import parse_cli

    main(parse_cli(Args, prog="bench_repmixer.py"))
