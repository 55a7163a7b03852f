"""Host-side parameter fabrication at exact init shapes (benchmark-only).

Real checkpoints are unreachable in this environment (zero egress —
reference ``scripts/download_fastvlm.sh:14-29``), and *initializing* a 7B
model on the tunneled chip is minutes of remote compile plus a float tree
that cannot coexist with its int8 copy in 16 GB HBM. For throughput
measurement neither matters: compute and bandwidth cost are functions of
shapes and dtypes only (values need only be finite with non-degenerate
per-column spread for the int8 quantizer). So benchmarks fabricate the tree
host-side from ``jax.eval_shape`` — no tracing on device, near-memcpy
speed — and ship the (possibly quantized) result over PJRT once.

Used by ``scripts/bench_7b_serving.py`` and, via
``FastVLMBackboneConfig.fabricate_params``, by the full-policy 7B bench
(``bench.py --model-id fastvlm-7b --fabricate``).
"""

from __future__ import annotations

import numpy as np


def fabricate_like(tree_shapes, seed: int = 0, scale: float = 0.02):
    """Random-ish host numpy params matching a ``jax.eval_shape`` tree.

    Drawing ~7.6B gaussians takes ~50 min on one host core; instead a 64Ki
    random block is tiled to size — near-memcpy speed, still column-varied
    for per-channel absmax quantization.
    """
    import jax

    rng = np.random.default_rng(seed)
    block = rng.standard_normal(65536).astype(np.float32) * scale

    def make(leaf):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        reps = -(-n // block.size)
        arr = np.tile(block, reps)[:n].reshape(leaf.shape)
        return arr.astype(leaf.dtype)

    return jax.tree_util.tree_map(make, tree_shapes)
