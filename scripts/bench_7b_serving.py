#!/usr/bin/env python
"""FastVLM-7B text-tower serving on a SINGLE v5e chip via int8 weights.

The BASELINE.json north star is FastVLM-7B inference on v5e-8 (TP-sharded:
7B bf16 ~= 15.2 GB cannot fit one 16 GB chip with cache + programs). With
weight-only int8 (``io/quantize.py``) the decoder kernels shrink to ~6.4 GB
(+1.1 GB bf16 embedding), so the 7B *decode* path fits a single chip — a
deployment shape the bf16 model simply does not have. This script measures
it end to end:

- Parameters are fabricated host-side at the exact shapes/dtypes of
  ``qwen2_7b`` via ``jax.eval_shape`` (no tracing/compiling a 7B init on the
  remote chip; random values — identical compute cost to real weights),
  quantized on host with numpy-backed jnp, and shipped int8 over PJRT.
- Prefill (batch x prompt) and scanned decode (one compiled program for all
  steps, tiny final fetch) are timed separately; decode reports tokens/sec
  and the implied HBM weight-streaming bandwidth.

Usage (defaults measure the 7B single-chip configuration):
    python scripts/bench_7b_serving.py
    python scripts/bench_7b_serving.py --model-size 1.5b --quantization none
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass

import _bootstrap  # noqa: F401

import numpy as np

from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class Args:
    model_size: str = "7b"  # "0.5b" | "1.5b" | "7b"
    quantization: str = "int8"  # "int8" | "int4" | "w8a8" | "none"
    batch_size: int = 16
    prompt_len: int = 48
    max_new_tokens: int = 32
    iters: int = 5
    device: str | None = None  # None = default backend (TPU)
    seed: int = 0


def _fabricate(tree_shapes, rng: np.random.Generator):
    """Random-ish params at eval_shape'd shapes/dtypes (host numpy).

    Values are irrelevant to throughput (only finiteness and non-degenerate
    per-column scales matter); drawing 7.6B gaussians takes ~50 min on a
    single host core, so a 64Ki random block is tiled to size instead —
    near-memcpy speed, still column-varied for the quantizer.
    """
    import jax

    block = (rng.standard_normal(65536).astype(np.float32) * 0.02)

    def make(leaf):
        n = int(np.prod(leaf.shape))
        reps = -(-n // block.size)
        arr = np.tile(block, reps)[:n].reshape(leaf.shape)
        return arr.astype(leaf.dtype)

    return jax.tree_util.tree_map(make, tree_shapes)


def main(args: Args) -> None:
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax
    import jax.numpy as jnp

    from vla_fastvlm_tpu.device import enable_compilation_cache
    from vla_fastvlm_tpu.io.quantize import count_quantized

    enable_compilation_cache()
    from vla_fastvlm_tpu.models.qwen2 import (
        Qwen2ForCausalLM,
        init_kv_cache,
        qwen2_0_5b,
        qwen2_1_5b,
        qwen2_7b,
    )

    preset = {"0.5b": qwen2_0_5b, "1.5b": qwen2_1_5b, "7b": qwen2_7b}[args.model_size]
    cfg = preset(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 quantization=args.quantization)
    model = Qwen2ForCausalLM(cfg)
    dev = jax.devices()[0]
    print(f"[7b-bench] {args.model_size} quant={args.quantization} on {dev}",
          file=sys.stderr)

    # Host-side parameter fabrication at exact init shapes.
    rng = np.random.default_rng(args.seed)
    ids_shape = jnp.zeros((1, 4), jnp.int32)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        lambda: Qwen2ForCausalLM(cfg.replace(quantization="none")).init(
            jax.random.PRNGKey(0), input_ids=ids_shape
        )["params"]
    )
    params = _fabricate(shapes, rng)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    print(f"[7b-bench] fabricated {n_params / 1e9:.2f}B params "
          f"in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    if args.quantization != "none":
        # Host-side quantization: the params are numpy, so quantize_params
        # takes ops/quant's pure-numpy path — no device staging (the float
        # 7B tree would not fit the chip).
        from vla_fastvlm_tpu.io.quantize import quantize_params

        t0 = time.perf_counter()
        params = quantize_params(params, mode=args.quantization)
        print(f"[7b-bench] quantized {count_quantized(params)} kernel stacks "
              f"in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # NB: host numpy stores int4 one-per-byte; on device s4 packs two per
    # byte — count the device footprint.
    import jax.numpy as jnp

    weight_bytes = sum(
        leaf.nbytes // 2 if leaf.dtype == jnp.int4 else leaf.nbytes
        for leaf in jax.tree_util.tree_leaves(params)
    )
    print(f"[7b-bench] device weight footprint {weight_bytes / 1e9:.2f} GB",
          file=sys.stderr)

    t0 = time.perf_counter()
    from vla_fastvlm_tpu.device import place_params

    params = place_params(params, dev)  # device_put + int4 layout staging
    jax.block_until_ready(params)
    print(f"[7b-bench] transfer {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    b, t = args.batch_size, args.prompt_len
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size - 1, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    max_len = t + args.max_new_tokens

    # Pin s4 entry layouts to the staged arrays' own Formats: XLA's layout
    # assignment can otherwise pick an entry layout our canonical s4 arrays
    # cannot be relayouted to (device.py::int4_entry_formats; the remaining
    # annotation-only mismatch is absorbed by device._patch_s4_layout_eq).
    from functools import partial

    from vla_fastvlm_tpu.device import int4_entry_formats

    pformats = int4_entry_formats(params)

    @partial(jax.jit, in_shardings=(pformats, None, None))
    def prefill(params, ids, mask):
        cache = init_kv_cache(cfg, b, max_len)
        logits, _, cache = model.apply(
            {"params": params}, input_ids=ids, attention_mask=mask, cache=cache
        )
        return logits[:, -1].argmax(-1).astype(jnp.int32), cache

    @partial(jax.jit, in_shardings=(pformats, None, None))
    def decode(params, token0, cache):
        def step(carry, _):
            token, cache = carry
            logits, _, cache = model.apply(
                {"params": params}, input_ids=token[:, None], cache=cache
            )
            token = logits[:, -1].argmax(-1).astype(jnp.int32)
            return (token, cache), token

        (_, _), tokens = jax.lax.scan(
            step, (token0, cache), None, length=args.max_new_tokens
        )
        return tokens.T

    t0 = time.perf_counter()
    token0, cache = prefill(params, ids, mask)
    np.asarray(token0)
    print(f"[7b-bench] prefill compile+first {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    prefill_times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        token0, cache = prefill(params, ids, mask)
        np.asarray(token0)
        prefill_times.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    np.asarray(decode(params, token0, cache))
    print(f"[7b-bench] decode compile+first {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    decode_times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        np.asarray(decode(params, token0, cache))
        decode_times.append(time.perf_counter() - t0)

    prefill_p50 = sorted(prefill_times)[len(prefill_times) // 2]
    decode_p50 = sorted(decode_times)[len(decode_times) // 2]
    step_ms = decode_p50 / args.max_new_tokens * 1e3
    tokens_per_sec = b * args.max_new_tokens / decode_p50
    # Implied weight-streaming bandwidth: every decode step reads all
    # decoder matmul kernels once (embedding gather + lm_head included in
    # weight_bytes; per-step cache reads are small at these lengths).
    gbps = weight_bytes / (decode_p50 / args.max_new_tokens) / 1e9
    print(
        f"[7b-bench] prefill p50 {prefill_p50 * 1e3:.1f} ms "
        f"({b}x{t} tokens), decode p50 {step_ms:.2f} ms/step "
        f"({gbps:.0f} GB/s implied)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"qwen2-{args.model_size} single-chip decode "
                    f"({args.quantization}, batch {b}, prompt {t})"
                ),
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/sec/chip",
                "prefill_ms": round(prefill_p50 * 1e3, 1),
                "decode_ms_per_step": round(step_ms, 2),
                "weight_gb": round(weight_bytes / 1e9, 2),
            }
        )
    )


if __name__ == "__main__":
    main(parse_cli(Args, prog="bench_7b_serving.py"))
