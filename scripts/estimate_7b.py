#!/usr/bin/env python
"""Estimate FastVLM-7B serving throughput on v5e-8 (documented in BASELINE.md).

No 8-chip hardware exists in this environment and 7B does not fit the single
tunneled v5e, so the estimate is:

    actions/sec/chip = MFU_assumed * v5e_peak_bf16 / (FLOPs_per_action / 8) / 8

where FLOPs per action come from XLA's own cost model on an AOT-compiled
(abstract, no weights materialized) 7B serving step — vision tower + Qwen2
prefill + pooling + action head — and the MFU band is anchored on the
*measured* 0.5B serving MFU from bench.py on the real chip. The TP-sharded
program itself is validated by tests/test_7b_sharding_aot.py.

Run on CPU: python scripts/estimate_7b.py
"""

from __future__ import annotations

import sys
from pathlib import Path

_ROOT = str(Path(__file__).resolve().parent.parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vla_fastvlm_tpu.models import FastVLM
    from vla_fastvlm_tpu.models.action_head import ActionExpertHead
    from vla_fastvlm_tpu.models.fastvit import fastvithd
    from vla_fastvlm_tpu.models.fastvlm import FastVLMConfig, pool_hidden
    from vla_fastvlm_tpu.models.qwen2 import qwen2_7b
    from vla_fastvlm_tpu.utils.flops import compiled_flops

    batch, image_size, prompt = 8, 1024, 48
    # scan_layers=False: XLA's cost model counts a lax.scan body ONCE, so
    # counting on the production scanned program would miss 27/28 of the
    # decoder FLOPs (round-3 finding; utils/flops.fastvlm_serve_flops).
    # The estimate published in rounds 1-2 (659 GFLOP/action, 30-90
    # actions/sec/chip band) had exactly that bug — correct is ~4.5
    # TFLOP/action at these shapes.
    cfg = FastVLMConfig(
        vision=fastvithd(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16),
        text=qwen2_7b(
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, scan_layers=False
        ),
        image_size=image_size,
    )
    model = FastVLM(cfg)
    head = ActionExpertHead(
        state_dim=14, action_dim=14, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
    )

    params_shape = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, image_size, image_size), jnp.bfloat16),
            jnp.zeros((1, 4), jnp.int32),
        )
    )["params"]
    head_shape = jax.eval_shape(
        lambda: head.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, cfg.text.hidden_size)),
            jnp.zeros((1, 14)),
        )
    )["params"]

    def serve_step(params, head_params, images, ids, mask, states):
        hidden, seq_mask, text_mask = model.apply(
            {"params": params}, images, ids, mask
        )
        feats = pool_hidden(hidden, text_mask, "last_token")
        return head.apply({"params": head_params}, feats, states)

    abstract = lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype)
    compiled = (
        jax.jit(serve_step)
        .lower(
            jax.tree_util.tree_map(abstract, params_shape),
            jax.tree_util.tree_map(abstract, head_shape),
            jax.ShapeDtypeStruct((batch, 3, image_size, image_size), jnp.bfloat16),
            jax.ShapeDtypeStruct((batch, prompt), jnp.int32),
            jax.ShapeDtypeStruct((batch, prompt), jnp.int32),
            jax.ShapeDtypeStruct((batch, 14), jnp.bfloat16),
        )
        .compile()
    )
    total_flops = compiled_flops(compiled)
    per_action = total_flops / batch
    peak = 197e12  # v5e bf16
    print(
        f"7B serving step (batch {batch}, {image_size}px, prompt {prompt}): "
        f"{total_flops / 1e12:.2f} TFLOP -> {per_action / 1e9:.1f} GFLOP/action"
    )
    print("Estimated v5e-8 throughput (8 chips, TP=4 x DP=2):")
    for mfu in (0.10, 0.15, 0.20, 0.30):
        total = mfu * peak * 8 / per_action
        print(
            f"  MFU {mfu:.0%}: {total:7.1f} actions/sec total = "
            f"{total / 8:5.1f} actions/sec/chip"
        )
    # Measured single-chip 7B anchor (scripts/bench_7b_serving.py,
    # BASELINE.md): int8 prefill sustained ~49% of bf16 peak live on the
    # chip, which grounds the 30% row above as conservative for the
    # MXU-bound decoder share of the step.
    print(
        "Measured anchor: 7B int8 prefill ran at ~49% of peak on one chip "
        "(110.8 ms for 16x48 tokens); decode 667 tokens/sec/chip."
    )


if __name__ == "__main__":
    main()
