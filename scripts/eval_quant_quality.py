#!/usr/bin/env python
"""End-task int8/int4/w8a8 quality evidence (VERDICT r2 #6).

Round 2 pinned int8 error *bounds* on random weights (tests/
test_quantization.py) — the friendliest case for per-channel absmax. This
script measures the END-TASK effect on the policy's actual objective:

1. Extract pooled backbone features for a synthetic ALOHA set twice — float
   weights and ``quantization="int8"`` — from the same fabricated/initialized
   backbone. (The backbone is frozen + stop-gradient'd by reference
   semantics, so head training on precomputed features is exactly policy
   training.)
2. Train the action head to convergence on the FLOAT features (the deployed
   scenario: train in float, quantize for serving).
3. Report action MSE of that float-trained head under float vs int8
   features, plus the mean relative action delta. An overfit head amplifies
   feature perturbations, making this a conservative (pessimistic) probe.
4. ``kv_cache_quantization`` cannot affect the policy step at all (the
   serving forward has no KV cache — reference hot loop
   ``lerobot_fastvla/modeling_fastvla.py:113-125`` is one prefill per env
   step); its end-task surface is *generation*, measured here as greedy
   token agreement + last-step logit MSE vs the float cache.

Usage:
    python scripts/eval_quant_quality.py --device cpu --model-id fastvlm-tiny \
        --image-size 64                        # fast smoke
    python scripts/eval_quant_quality.py --model-id fastvlm-0.5b \
        --fabricate --image-size 256           # 0.5B shapes on the chip
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
    model_id: str = "fastvlm-tiny"
    image_size: int = 64
    num_samples: int = 64
    state_dim: int = 8
    action_dim: int = 8
    train_steps: int = 600
    lr: float = 1e-3
    dtype: str = "bfloat16"
    device: str | None = None
    fabricate: bool = False
    # generation check (kv int8 end-task surface)
    gen_batch: int = 4
    gen_new_tokens: int = 32
    # SmoothQuant migration strength for the w8a8_smooth column
    # (io/smooth.py; self-calibrated on the eval batch). <= 0 disables.
    smooth_alpha: float = 0.5
    seed: int = 0


def main(args: Args) -> None:
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax
    import jax.numpy as jnp
    import optax

    from vla_fastvlm_tpu.device import enable_compilation_cache
    from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLMWithExpert

    enable_compilation_cache()
    rng = np.random.default_rng(args.seed)

    def build(quantization, kv="none"):
        return FastVLMWithExpert(
            FastVLAConfig(
                vlm_model_name=args.model_id,
                bootstrap_model_name=args.model_id,
                image_size=args.image_size,
                state_dim=args.state_dim,
                action_dim=args.action_dim,
                dtype=args.dtype,
                param_dtype=args.dtype,
                quantization=quantization,
                kv_cache_quantization=kv,
                fabricate_params=args.fabricate,
                dropout=0.0,
            )
        )

    model_f = build("none")
    model_q = build("int8")
    model_q4 = build("int4")
    # Quality probe, not a perf probe: drop the w8a8 token gate so the
    # int8 x int8 activation-quant math is what gets measured even at smoke
    # shapes (production engages it only at >=W8A8_MIN_TOKENS tokens).
    from vla_fastvlm_tpu.ops import quant as _quant

    _quant.W8A8_MIN_TOKENS = 0
    model_w8 = build("w8a8")

    images = rng.random(
        (args.num_samples, 3, args.image_size, args.image_size),
        dtype=np.float32,
    )
    states = rng.standard_normal(
        (args.num_samples, args.state_dim)
    ).astype(np.float32)
    actions = rng.standard_normal(
        (args.num_samples, args.action_dim)
    ).astype(np.float32)
    ids, mask = model_f.backbone._prep_text(
        ["insert the peg\n"] * args.num_samples
    )
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    imgs_dev = jnp.asarray(images).astype(model_f.backbone.model_config.text.dtype)

    t0 = time.perf_counter()
    feats = {}
    for name, m in (
        ("float", model_f),
        ("int8", model_q),
        ("int4", model_q4),
        ("w8a8", model_w8),
    ):
        fn = jax.jit(m.backbone.features_fn)
        feats[name] = np.asarray(
            fn(m.backbone.params, imgs_dev, ids, mask), np.float32
        )
    if args.smooth_alpha > 0:
        # SmoothQuant-ed w8a8: calibrate activation absmax on this batch,
        # migrate outliers into the weights (float-identical transform), THEN
        # quantize — the documented fix for activation-outlier error
        # (io/smooth.py; docs/SERVING.md).
        from vla_fastvlm_tpu.io.quantize import quantize_params
        from vla_fastvlm_tpu.io.smooth import (
            collect_norm_absmax,
            smooth_params_w8a8,
        )

        calib = collect_norm_absmax(
            model_f.backbone.model, model_f.backbone.params, imgs_dev, ids, mask
        )
        smoothed_q = quantize_params(
            smooth_params_w8a8(
                model_f.backbone.params, calib, alpha=args.smooth_alpha
            ),
            mode="w8a8",
        )
        feats["w8a8_smooth"] = np.asarray(
            jax.jit(model_w8.backbone.features_fn)(smoothed_q, imgs_dev, ids, mask),
            np.float32,
        )
    print(f"[quant-eval] features extracted in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # ---- train the head on FLOAT features (full-batch Adam) ----
    head = model_f.head
    head_params = model_f.head_params
    tx = optax.adam(args.lr)
    opt_state = tx.init(head_params)
    f32 = jnp.asarray(feats["float"])
    st = jnp.asarray(states)
    act = jnp.asarray(actions)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            preds = head.apply({"params": p}, f32, st, deterministic=True)
            return jnp.mean(jnp.square(preds.astype(jnp.float32) - act))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    loss = None
    for step in range(args.train_steps):
        head_params, opt_state, loss = train_step(head_params, opt_state)
    final_loss = float(loss)
    print(f"[quant-eval] head trained {args.train_steps} steps in "
          f"{time.perf_counter() - t0:.1f}s, final train MSE {final_loss:.5f}",
          file=sys.stderr)

    @jax.jit
    def eval_mse(params, feats_in):
        preds = head.apply({"params": params}, feats_in, st, deterministic=True)
        return (
            jnp.mean(jnp.square(preds.astype(jnp.float32) - act)),
            preds.astype(jnp.float32),
        )

    mse = {}
    preds = {}
    for name in feats:
        m, p = eval_mse(head_params, jnp.asarray(feats[name]))
        mse[name] = float(m)
        preds[name] = np.asarray(p)

    def _rel(a, b):
        return float(
            np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        )

    rel_delta = _rel(preds["int8"], preds["float"])
    rel_delta4 = _rel(preds["int4"], preds["float"])
    rel_delta8a = _rel(preds["w8a8"], preds["float"])
    feat_rel = _rel(feats["int8"], feats["float"])
    feat_rel4 = _rel(feats["int4"], feats["float"])
    feat_rel8a = _rel(feats["w8a8"], feats["float"])
    smooth_stats = {}
    if "w8a8_smooth" in feats:
        smooth_stats = {
            "eval_mse_w8a8_smooth": round(mse["w8a8_smooth"], 6),
            "action_rel_delta_w8a8_smooth": round(
                _rel(preds["w8a8_smooth"], preds["float"]), 6
            ),
            "feature_rel_delta_w8a8_smooth": round(
                _rel(feats["w8a8_smooth"], feats["float"]), 6
            ),
            "smooth_alpha": args.smooth_alpha,
        }

    # ---- generation surface: int8 KV (and int8 weights + int8 KV) ----
    from vla_fastvlm_tpu.serving import generate

    gb = args.gen_batch
    gen_imgs = imgs_dev[:gb]
    gen_ids, gen_mask = ids[:gb], mask[:gb]
    model_kv = build("none", kv="int8")
    model_qkv = build("int8", kv="int8")
    gen = {}
    logits_last = {}
    for name, m, params in (
        ("float", model_f, model_f.backbone.params),
        ("int8kv", model_kv, model_f.backbone.params),
        ("int8w+int8kv", model_qkv, model_q.backbone.params),
    ):
        tokens, logits = generate(
            m.backbone.model, params, gen_imgs, gen_ids, gen_mask,
            max_new_tokens=args.gen_new_tokens, eos_token_id=-1,
            return_last_logits=True,
        )
        gen[name] = np.asarray(tokens)
        logits_last[name] = np.asarray(logits, np.float32)
    agree_kv = float((gen["int8kv"] == gen["float"]).mean())
    agree_both = float((gen["int8w+int8kv"] == gen["float"]).mean())
    logit_mse_kv = float(
        np.mean(np.square(logits_last["int8kv"] - logits_last["float"]))
    )

    print(
        json.dumps(
            {
                "metric": f"int8 end-task quality ({args.model_id}, "
                          f"{args.image_size}px, {args.num_samples} samples)",
                "train_mse_float": round(final_loss, 6),
                "eval_mse_float": round(mse["float"], 6),
                "eval_mse_int8": round(mse["int8"], 6),
                "eval_mse_int4": round(mse["int4"], 6),
                "eval_mse_w8a8": round(mse["w8a8"], 6),
                "action_rel_delta_int8": round(rel_delta, 6),
                "action_rel_delta_int4": round(rel_delta4, 6),
                "action_rel_delta_w8a8": round(rel_delta8a, 6),
                "feature_rel_delta_int8": round(feat_rel, 6),
                "feature_rel_delta_int4": round(feat_rel4, 6),
                "feature_rel_delta_w8a8": round(feat_rel8a, 6),
                "gen_token_agreement_int8kv": round(agree_kv, 4),
                "gen_token_agreement_int8w_int8kv": round(agree_both, 4),
                "gen_last_logit_mse_int8kv": round(logit_mse_kv, 6),
                **smooth_stats,
                "note": (
                    "kv int8 cannot affect the policy step (no KV cache in "
                    "the serving forward); its surface is generation"
                ),
            }
        )
    )


if __name__ == "__main__":
    main(parse_cli(Args, prog="eval_quant_quality.py"))
