#!/usr/bin/env python
"""Component-wise device timing for the serving path.

Times each stage of the policy step separately (letterbox, vision tower,
decoder prefill, action head) with a device->host fetch per iteration, and
reports the measured dispatch floor so on-device time can be read off.
Used to target Pallas/fusion work where it matters.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

import _bootstrap  # noqa: F401

from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class ProfileArgs:
    model_id: str = "fastvlm-0.5b"
    batch_size: int = 64
    image_size: int = 256
    tokenizer_max_length: int = 64
    dtype: str = "bfloat16"
    iters: int = 10
    device: Optional[str] = None


def timeit(name, fn, iters):
    fn()  # compile + warm
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    p50 = sorted(ts)[len(ts) // 2]
    print(f"{name:>24}: p50 {p50 * 1e3:8.2f} ms", file=sys.stderr)
    return p50


def main(args: ProfileArgs) -> None:
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax
    import jax.numpy as jnp

    from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLMWithExpert
    from vla_fastvlm_tpu.models.fastvlm import FastVLM
    from vla_fastvlm_tpu.ops.image import prepare_image_batch

    config = FastVLAConfig(
        vlm_model_name=args.model_id,
        bootstrap_model_name=args.model_id,
        image_size=args.image_size,
        tokenizer_max_length=args.tokenizer_max_length,
        dtype=args.dtype,
        param_dtype=args.dtype,
        dropout=0.0,
    )
    model = FastVLMWithExpert(config)
    backbone = model.backbone
    mcfg = backbone.model_config
    b = args.batch_size

    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        rng.random((b, 3, args.image_size, args.image_size), dtype=np.float32)
    )
    ids, mask = backbone._prep_text(["pick up the red block\n"] * b)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    states = jnp.zeros((b, config.state_dim), mcfg.text.dtype)
    params = backbone.params

    # dispatch floor
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    floor = timeit("dispatch+fetch floor", lambda: np.asarray(tiny(z)), args.iters)

    # letterbox
    letterbox = jax.jit(
        lambda x: prepare_image_batch(x, size=mcfg.image_size, dtype=mcfg.text.dtype)
    )
    images = letterbox(raw)

    def f_letterbox():
        np.asarray(jnp.sum(letterbox(raw)))

    t_letter = timeit("letterbox", f_letterbox, args.iters)

    # vision tower + projector
    vision = jax.jit(
        lambda p, img: model.backbone.model.apply(
            {"params": p}, img, method=FastVLM.encode_images
        )
    )

    def f_vision():
        np.asarray(jnp.sum(vision(params, images)))

    t_vision = timeit("vision+projector", f_vision, args.iters)

    # full backbone (vision + prefill + pool)
    feats_fn = jax.jit(backbone.features_fn)

    def f_backbone():
        np.asarray(jnp.sum(feats_fn(params, images, ids, mask)))

    t_backbone = timeit("full backbone", f_backbone, args.iters)

    # full policy step
    step = jax.jit(model.apply_fn)

    def f_step():
        np.asarray(jnp.sum(step(model.params, images, ids, mask, states)))

    t_step = timeit("full policy step", f_step, args.iters)

    # attention impl A/B on identical params: Pallas flash vs XLA decoder path
    from vla_fastvlm_tpu.models.fastvlm import pool_last_text_token

    for impl in ("flash", "xla"):
        alt_cfg = mcfg.replace(text=mcfg.text.replace(attention_impl=impl))
        alt = FastVLM(alt_cfg)

        def fwd(p, img, i, m, alt=alt):
            hidden, _, text_mask = alt.apply({"params": p}, img, i, m)
            return pool_last_text_token(hidden, text_mask)

        fwd = jax.jit(fwd)

        def f_alt(fwd=fwd):
            np.asarray(jnp.sum(fwd(params, images, ids, mask)))

        timeit(f"backbone[{impl}]", f_alt, args.iters)

    print(
        f"[derived] decoder+pool ~= {max(0.0, t_backbone - t_vision) * 1e3:.2f} ms, "
        f"head ~= {max(0.0, t_step - t_backbone) * 1e3:.2f} ms, "
        f"on-device step ~= {max(0.0, t_step - floor) * 1e3:.2f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main(parse_cli(ProfileArgs, prog="profile_components.py"))
