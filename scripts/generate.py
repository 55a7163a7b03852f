#!/usr/bin/env python
"""VLM text generation CLI: image + prompt -> caption/answer.

The reference never exposes generation (its backbone only pools features),
but the llava_qwen2 checkpoint it wraps is a full VLM; this CLI drives the
KV-cached TPU generation path (``vla_fastvlm_tpu/serving/generate.py``) —
one jitted prefill + one scanned decode program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import _bootstrap  # noqa: F401

from vla_fastvlm_tpu.utils import configure_logging
from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class GenerateArgs:
    model_id: str = "apple/FastVLM-0.5B"
    bootstrap_model_id: str = "apple/FastVLM-0.5B"
    prompt: str = "Describe the image."
    image: Optional[str] = None  # path; None -> zeros (text-only smoke)
    image_size: Optional[int] = None
    max_new_tokens: int = 64
    temperature: float = 0.0
    top_p: float = 1.0
    tokenizer_max_length: int = 64
    dtype: str = "bfloat16"
    device: Optional[str] = None
    seed: int = 0
    # Mesh factors for sharded generation (dp*tp devices; 1x1 = single chip).
    dp: int = 1
    tp: int = 1
    # "int8": weight-only quantized decoder kernels (io/quantize.py).
    quantization: str = "none"


def main(args: GenerateArgs) -> None:
    if args.device:
        import os

        if args.dp * args.tp > 1 and args.device == "cpu":
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags
                    + f" --xla_force_host_platform_device_count={args.dp * args.tp}"
                ).strip()
        import jax

        jax.config.update("jax_platforms", args.device)
    configure_logging()
    from vla_fastvlm_tpu.device import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from vla_fastvlm_tpu.model.fastvlm_adapter import (
        FastVLMBackbone,
        FastVLMBackboneConfig,
    )
    from vla_fastvlm_tpu.ops.image import prepare_image_batch
    from vla_fastvlm_tpu.serving import generate

    backbone = FastVLMBackbone(
        FastVLMBackboneConfig(
            model_id=args.model_id,
            bootstrap_model_id=args.bootstrap_model_id,
            force_image_size=args.image_size,
            tokenizer_max_length=args.tokenizer_max_length,
            dtype=args.dtype,
            param_dtype=args.dtype,
            quantization=args.quantization,
            seed=args.seed,
        )
    )
    mcfg = backbone.model_config
    size = mcfg.image_size

    if args.image:
        from PIL import Image

        raw = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 255.0
        img = np.transpose(raw, (2, 0, 1))[None]
    else:
        img = np.zeros((1, 3, size, size), np.float32)
    images = prepare_image_batch(
        jnp.asarray(img), size=size, dtype=mcfg.text.dtype
    )

    ids, mask = backbone._prep_text([args.prompt])
    gen_kwargs = dict(
        max_new_tokens=args.max_new_tokens,
        eos_token_id=getattr(backbone.tokenizer, "eos_token_id", 2) or 2,
        temperature=args.temperature,
        top_p=args.top_p,
        rng=jax.random.PRNGKey(args.seed),
    )
    gen_images = images if mcfg.num_image_tokens > 0 else None
    if args.dp * args.tp > 1:
        from vla_fastvlm_tpu.parallel import make_mesh
        from vla_fastvlm_tpu.serving import sharded_generate

        tokens = sharded_generate(
            backbone.model, backbone.params, gen_images,
            jnp.asarray(ids), jnp.asarray(mask),
            make_mesh(data=args.dp, model=args.tp), **gen_kwargs,
        )
    else:
        tokens = generate(
            backbone.model, backbone.params, gen_images,
            jnp.asarray(ids), jnp.asarray(mask), **gen_kwargs,
        )
    text = backbone.tokenizer.decode(np.asarray(tokens[0]).tolist())
    print(text)


if __name__ == "__main__":
    main(parse_cli(GenerateArgs, prog="generate.py"))
