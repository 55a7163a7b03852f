#!/usr/bin/env python
"""Benchmark: FastVLM-0.5B fastvla policy serving throughput (actions/sec/chip).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "actions/sec/chip", "vs_baseline": N}

Workload: the §3.3 serving hot loop of the reference — one full policy step
(image letterbox + FastViTHD encode + projector + Qwen2 prefill + pooled
features + action head) per action, batched. The reference repo publishes no
numbers (BASELINE.md); ``vs_baseline`` is measured against the documented
A100-PyTorch estimate in BASELINE.md (``A100_EST_ACTIONS_PER_SEC``) until a
real torch baseline run replaces it. Everything else (model, tokenizer,
shapes) matches the reference's default serving configuration with
chunk_size=1 (one VLM forward per env step,
reference ``lerobot_fastvla/modeling_fastvla.py:113-125``).
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

_ROOT = str(Path(__file__).resolve().parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# Estimated PyTorch-reference throughput for FastVLM-0.5B fastvla serving on
# one A100 (batch 16, 256px, chunk 1). Estimate — see BASELINE.md; replaced by
# a measured number when an A100 torch run exists.
A100_EST_ACTIONS_PER_SEC = 60.0


@dataclass
class BenchArgs:
    model_id: str = "fastvlm-0.5b"
    # Fleet-serving batch: throughput sweet spot measured on v5e (64 -> 791,
    # 128 -> 913, 256 -> 921 actions/sec/chip at 256px; 128 keeps step
    # latency at ~138 ms while capturing ~99% of plateau throughput).
    batch_size: int = 128
    image_size: int = 256
    tokenizer_max_length: int = 64
    dtype: str = "bfloat16"
    warmup: int = 3
    iters: int = 20
    device: Optional[str] = None  # e.g. "cpu" for local smoke
    # "serve": policy forward (default, the driver metric).
    # "train": full jitted train step (fwd+bwd+AdamW) samples/sec/chip.
    # "generate": KV-cached VLM decoding, tokens/sec/chip.
    mode: str = "serve"
    attention_impl: str = "auto"
    # "int8" | "int4": weight-only quantized decoder kernels (2x / 4x less
    # decode weight-HBM traffic — the small-batch generate bottleneck).
    # "w8a8": int8 weights + dynamic int8 activations (the MXU's 2x int8
    # path — the compute-bound prefill lever; ops/quant.py).
    quantization: str = "none"
    max_new_tokens: int = 64
    # Mesh factors for sharded serving (dp*tp devices; 1x1 = single chip).
    # TP shards the Qwen2 decoder Megatron-style, DP splits the batch — the
    # 7B-on-v5e-8 serving configuration is --dp 2 --tp 4.
    dp: int = 1
    tp: int = 1
    # Fabricate params host-side at exact init shapes (io/fabricate.py):
    # required for 7B-shape runs (no device init / no checkpoint needed;
    # identical compute+bandwidth cost to real weights). The measured
    # north-star configuration (33.8 actions/sec/chip; int8 weight-only
    # measures 25.5 — BASELINE.md) is:
    #   python bench.py --model-id fastvlm-7b --quantization w8a8 \
    #       --fabricate --image-size 1024 --batch-size 8
    fabricate: bool = False
    # Multi-camera observations (>1 stacks ncam views per sample) and action
    # chunking (>1 emits (chunk, action_dim) per forward) — BASELINE.json
    # config #4 (multi-camera ALOHA bimanual + chunking head).
    num_cameras: int = 1
    chunk_size: int = 1
    # --mode train only: train the FULL model (vision tower + decoder + head,
    # remat on) instead of the reference-semantics head-only step. Measures
    # the framework's from-scratch/fine-tuning regime.
    train_backbone: bool = False
    # --mode train only: rank-N LoRA adapters on the decoder projections over
    # the frozen (optionally --quantization int8) base — the QLoRA step. The
    # 7B-fits-one-chip configuration is:
    #   python bench.py --mode train --model-id fastvlm-7b --fabricate \
    #       --quantization int8 --lora-rank 16 --batch-size 8
    lora_rank: int = 0


def main(args: BenchArgs) -> None:
    if args.lora_rank > 0 and args.mode != "train":
        # lora_rank is a training knob (and it turns decoder remat on via
        # FastVLAConfig.to_backbone_config); inference benches stay
        # remat-free by construction. Serving WITH adapters is
        # scripts/serve.py --lora-dir.
        raise SystemExit("--lora-rank > 0 requires --mode train")
    if args.device:
        import os

        if args.dp * args.tp > 1 and args.device == "cpu":
            # virtual multi-device CPU mesh for local sharded-serving smoke
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags
                    + f" --xla_force_host_platform_device_count={args.dp * args.tp}"
                ).strip()
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vla_fastvlm_tpu.device import enable_compilation_cache
    from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLMWithExpert

    enable_compilation_cache()

    config = FastVLAConfig(
        vlm_model_name=args.model_id,
        bootstrap_model_name=args.model_id,
        image_size=args.image_size,
        tokenizer_max_length=args.tokenizer_max_length,
        dtype=args.dtype,
        param_dtype=args.dtype,
        attention_impl=args.attention_impl,
        quantization=args.quantization,
        fabricate_params=args.fabricate,
        num_cameras=args.num_cameras,
        chunk_size=args.chunk_size,
        train_backbone=args.train_backbone,
        freeze_backbone=not args.train_backbone,
        # Remat derivation (train_backbone OR lora_rank > 0) lives in
        # FastVLAConfig.to_backbone_config — shared with scripts/train.py.
        lora_rank=args.lora_rank,
        dropout=0.0,
    )
    print(f"[bench] building {args.model_id} on {jax.devices()[0]}", file=sys.stderr)
    t0 = time.perf_counter()
    model = FastVLMWithExpert(config)
    print(f"[bench] init {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    b = args.batch_size
    rng = np.random.default_rng(0)
    img_shape = (b, 3, args.image_size, args.image_size)
    if args.num_cameras > 1:
        img_shape = (b, args.num_cameras) + img_shape[1:]
    images = jnp.asarray(
        rng.random(img_shape, dtype=np.float32)
    ).astype(model.backbone.model_config.text.dtype)
    ids, mask = model.backbone._prep_text(["pick up the red block\n"] * b)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    states = jnp.zeros((b, config.state_dim), images.dtype)
    params = model.params

    if args.mode == "train":
        _bench_train(args, model, images, ids, mask, states)
        return
    if args.mode == "generate":
        _bench_generate(args, model, images, ids, mask)
        return

    n_chips = args.dp * args.tp
    if n_chips > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vla_fastvlm_tpu.parallel import make_mesh, shard_batch, shard_params

        mesh = make_mesh(data=args.dp, model=args.tp)
        params = shard_params(mesh, params)
        sharded = shard_batch(
            mesh, {"images": images, "ids": ids, "mask": mask, "states": states}
        )
        images, ids, mask, states = (
            sharded["images"], sharded["ids"], sharded["mask"], sharded["states"]
        )
        step = jax.jit(
            model.apply_fn, out_shardings=NamedSharding(mesh, P())
        )
        print(f"[bench] mesh dp={args.dp} tp={args.tp}", file=sys.stderr)
    else:
        step = jax.jit(model.apply_fn)

    # Model FLOPs per step, XLA-counted on a scan-UNROLLED abstract twin
    # (utils/flops.py): the cost model counts a lax.scan body once, so the
    # production (scanned-decoder) program undercounts by ~num_layers on the
    # decoder share. Feeds the MFU column of BASELINE.md.
    from vla_fastvlm_tpu.utils.flops import compiled_flops, fastvlm_serve_flops, mfu

    try:
        step_flops = fastvlm_serve_flops(model, b, int(ids.shape[1]))
        scanned_flops = compiled_flops(
            step.lower(params, images, ids, mask, states).compile()
        )
        if scanned_flops:
            print(
                f"[bench] flops: {step_flops / 1e9:.1f} GFLOP/step exact vs "
                f"{scanned_flops / 1e9:.1f} scan-body-once (compiled program)",
                file=sys.stderr,
            )
    except Exception as exc:  # pragma: no cover - backend dependent
        print(f"[bench] cost analysis unavailable: {exc}", file=sys.stderr)
        step_flops = None

    # Dispatch-overhead floor (tunnel RTT on remote backends): time a trivial
    # jitted op with a host fetch. Reported for transparency; not subtracted.
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(tiny(z))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny(z))
        rtts.append(time.perf_counter() - t0)
    print(f"[bench] dispatch+fetch floor p50 {sorted(rtts)[2] * 1e3:.1f} ms",
          file=sys.stderr)

    # Chain each step's output into the next state input AND synchronize every
    # iteration: closed-loop serving semantics (act -> observe -> act), and
    # async dispatch pipelining/elision cannot flatter the number.
    def chained(params, images, ids, mask, states):
        out = step(params, images, ids, mask, states)
        if out.shape == states.shape:
            return out.astype(states.dtype)
        return states + out.sum() * 0

    # NOTE: each iteration ends with a device->host fetch of the (tiny)
    # action array, not just block_until_ready — on tunneled/remote PJRT
    # backends only a data fetch provably awaits execution, and in real
    # closed-loop serving the robot controller reads the actions anyway.
    t0 = time.perf_counter()
    for _ in range(args.warmup):
        states = chained(params, images, ids, mask, states)
        np.asarray(states)
    print(f"[bench] warmup+compile {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    latencies = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        states = chained(params, images, ids, mask, states)
        np.asarray(states)
        latencies.append(time.perf_counter() - t0)
    elapsed = sum(latencies)
    p50 = sorted(latencies)[len(latencies) // 2]

    # Chunked heads emit chunk_size actions per forward (executed open-loop
    # within the chunk, ACT-style accounting).
    actions_per_sec = args.iters * b * args.chunk_size / elapsed / n_chips
    step_mfu = mfu(step_flops, p50, n_chips=n_chips)
    print(
        f"[bench] {args.iters} iters x batch {b} in {elapsed:.3f}s "
        f"(p50 {p50 * 1e3:.1f} ms/step, mean {elapsed / args.iters * 1e3:.1f} ms)"
        + (f", {step_flops / 1e9:.1f} GFLOP/step" if step_flops else "")
        + (f", MFU {step_mfu * 100:.1f}%" if step_mfu is not None else ""),
        file=sys.stderr,
    )
    result = {
        "metric": (
            f"fastvla {args.model_id} serving throughput "
            f"(batch {b}, {args.image_size}px, chunk {args.chunk_size}"
            + (f", {args.num_cameras}cam" if args.num_cameras > 1 else "")
            + (f", dp{args.dp}xtp{args.tp}" if n_chips > 1 else "")
            + ")"
        ),
        "value": round(actions_per_sec, 2),
        "unit": "actions/sec/chip",
        "vs_baseline": round(actions_per_sec / A100_EST_ACTIONS_PER_SEC, 3),
    }
    if step_mfu is not None:
        result["mfu"] = round(step_mfu, 4)
    print(json.dumps(result))


def _bench_generate(args: BenchArgs, model, images, ids, mask) -> None:
    """VLM decoding throughput. The whole generation (prefill + scanned
    decode) is ONE compiled program, so internal steps are data-dependent and
    cannot be elided by async dispatch; timing wraps the single execution
    with a host fetch of the emitted tokens."""
    import jax
    import numpy as np

    from vla_fastvlm_tpu.serving import generate

    b = args.batch_size
    vlm = model.backbone.model
    params = model.backbone.params

    def run():
        tokens = generate(
            vlm, params, images, ids, mask,
            max_new_tokens=args.max_new_tokens, eos_token_id=-1,  # never stop
        )
        return np.asarray(tokens)

    t0 = time.perf_counter()
    run()
    print(f"[bench] generate compile+first {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    latencies = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        run()
        latencies.append(time.perf_counter() - t0)
    p50 = sorted(latencies)[len(latencies) // 2]
    tokens_per_sec = b * args.max_new_tokens / p50
    print(
        f"[bench] generate batch {b} x {args.max_new_tokens} new tokens: "
        f"p50 {p50 * 1e3:.1f} ms",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"fastvla {args.model_id} generation throughput "
                    f"(batch {b}, {args.image_size}px, {args.max_new_tokens} new)"
                ),
                "value": round(tokens_per_sec, 2),
                "unit": "tokens/sec/chip",
                "vs_baseline": round(tokens_per_sec / A100_EST_ACTIONS_PER_SEC, 3),
            }
        )
    )


def _bench_train(args: BenchArgs, model, images, ids, mask, states) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    b = args.batch_size
    actions = jnp.zeros((b, model.config.action_dim), jnp.float32)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    trainable = model.trainable_params()
    # Head-only training (reference semantics) passes the backbone as the
    # frozen operand; --train-backbone puts the whole tree in ``trainable``
    # (merge order below lets it win).
    frozen = {} if "backbone" in trainable else {"backbone": model.backbone.params}

    n_chips = args.dp * args.tp
    if n_chips > 1:
        from vla_fastvlm_tpu.parallel import make_mesh, shard_batch, shard_params

        mesh = make_mesh(data=args.dp, model=args.tp)
        trainable = shard_params(mesh, trainable)
        frozen = shard_params(mesh, frozen)
        sharded = shard_batch(
            mesh,
            {"images": images, "ids": ids, "mask": mask, "states": states,
             "actions": actions},
        )
        images, ids, mask, states, actions = (
            sharded["images"], sharded["ids"], sharded["mask"],
            sharded["states"], sharded["actions"],
        )
        print(f"[bench] train mesh dp={args.dp} tp={args.tp}", file=sys.stderr)
    opt_state = tx.init(trainable)

    # frozen backbone params go in as an ARGUMENT, never a closure capture —
    # captured pytrees become HLO constants and a ~GB constant blob makes the
    # compiler (especially remote compile services) choke.
    def loss_fn(trainable, frozen, images, ids, mask, states, actions):
        preds = model.apply_fn(
            {**frozen, **trainable}, images, ids, mask, states
        )
        return jnp.mean(jnp.square(preds - actions.astype(preds.dtype)))

    @jax.jit
    def train_step(trainable, opt_state, frozen, images, ids, mask, states, actions):
        loss, grads = jax.value_and_grad(loss_fn)(
            trainable, frozen, images, ids, mask, states, actions
        )
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    for _ in range(args.warmup):
        trainable, opt_state, loss = train_step(
            trainable, opt_state, frozen, images, ids, mask, states, actions
        )
        float(loss)

    latencies = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        trainable, opt_state, loss = train_step(
            trainable, opt_state, frozen, images, ids, mask, states, actions
        )
        float(loss)  # host fetch = execution sync
        latencies.append(time.perf_counter() - t0)
    elapsed = sum(latencies)
    p50 = sorted(latencies)[len(latencies) // 2]
    samples_per_sec = args.iters * b / elapsed / n_chips

    # Exact train-step FLOPs (scan-unrolled counting twin on the CPU
    # backend — utils/flops.py; the compiled program's own cost model counts
    # scan bodies once and would be ~L-times low on the decoder).
    from vla_fastvlm_tpu.utils.flops import fastvlm_train_flops, mfu

    step_flops = fastvlm_train_flops(
        model, b, int(ids.shape[1]),
        train_backbone=args.train_backbone, lora_rank=args.lora_rank,
    )
    step_mfu = mfu(step_flops, p50, n_chips=n_chips)
    print(
        f"[bench] train {args.iters} iters x batch {b} in {elapsed:.3f}s "
        f"(p50 {p50 * 1e3:.1f} ms/step)"
        + (f", {step_flops / 1e9:.1f} GFLOP/step" if step_flops else "")
        + (f", MFU {step_mfu * 100:.1f}%" if step_mfu is not None else ""),
        file=sys.stderr,
    )
    result = {
        "metric": (
            f"fastvla {args.model_id} train step throughput "
            f"(batch {b}, {args.image_size}px"
            + (", full-backbone+remat" if args.train_backbone else ", head-only")
            + (
                f", qlora-r{args.lora_rank}({args.quantization})"
                if args.lora_rank > 0
                else ""
            )
            + (f", dp{args.dp}xtp{args.tp}" if n_chips > 1 else "")
            + ")"
        ),
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / A100_EST_ACTIONS_PER_SEC, 3),
    }
    if step_mfu is not None:
        result["mfu"] = round(step_mfu, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    from vla_fastvlm_tpu.utils.cli import parse_cli

    main(parse_cli(BenchArgs, prog="bench.py"))
