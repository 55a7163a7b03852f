#!/usr/bin/env python
"""Per-stage timing of the FastViTHD tower (the 1024px serving bottleneck).

Builds stage-prefix programs of the real tower and times each with a host
fetch, isolating which stages deserve kernel work.
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
class Args:
    batch_size: int = 16
    image_size: int = 1024
    dtype: str = "bfloat16"
    iters: int = 6
    device: Optional[str] = None


def main(args: Args) -> None:
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from vla_fastvlm_tpu.models.fastvit import (
        ConvAct,
        FastViTHD,
        PatchEmbed,
        RepDWConv,
        fastvithd,
    )

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    cfg = fastvithd(dtype=dtype, param_dtype=dtype)
    model = FastViTHD(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.random((args.batch_size, args.image_size, args.image_size, 3),
                    dtype=np.float32)
    ).astype(dtype)

    print(f"[profile_vision] init on {jax.devices()[0]}...", file=sys.stderr)
    t0 = time.perf_counter()
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    print(f"[profile_vision] init {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # Build stage-prefix modules sharing the full tower's params.
    class Prefix(nn.Module):
        cfg: object
        upto: int  # number of stages to run (0 = stem only)

        @nn.compact
        def __call__(self, x):
            c = self.cfg
            d0 = c.embed_dims[0]
            x = ConvAct(d0, 3, stride=2, dtype=c.dtype, param_dtype=c.param_dtype,
                        name="stem_0")(x)
            x = ConvAct(d0, 3, stride=2, groups=d0, dtype=c.dtype,
                        param_dtype=c.param_dtype, name="stem_1")(x)
            x = ConvAct(d0, 1, dtype=c.dtype, param_dtype=c.param_dtype,
                        name="stem_2")(x)
            from vla_fastvlm_tpu.models.fastvit import (
                AttentionBlock,
                RepMixerBlock,
            )

            for stage in range(self.upto):
                dim = c.embed_dims[stage]
                if stage > 0:
                    x = PatchEmbed(dim, c, name=f"patch_embed_{stage}")(x)
                if c.pos_embs[stage]:
                    x = RepDWConv(7, c.dtype, c.param_dtype,
                                  name=f"pos_emb_{stage}")(x)
                for blk in range(c.depths[stage]):
                    mixer = c.token_mixers[stage]
                    ratio = c.mlp_ratios[stage]
                    if mixer == "repmixer":
                        x = RepMixerBlock(c, ratio, name=f"stage{stage}_block{blk}")(x)
                    else:
                        x = AttentionBlock(c, ratio, name=f"stage{stage}_block{blk}")(x)
            return x

    def timed(name, fn):
        fn()
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        p50 = sorted(ts)[len(ts) // 2]
        print(f"{name:>18}: p50 {p50 * 1e3:8.2f} ms", file=sys.stderr)
        return p50

    tiny = jax.jit(lambda z: z + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(tiny(z))
    timed("floor", lambda: np.asarray(tiny(z)))

    prev = 0.0
    for upto in range(0, len(cfg.depths) + 1):
        prefix = Prefix(cfg, upto)
        fn = jax.jit(lambda p, x, prefix=prefix: jnp.sum(prefix.apply({"params": p}, x)))

        def run(fn=fn):
            np.asarray(fn(params, x))

        p50 = timed(f"thru stage {upto - 1}" if upto else "stem", run)
        print(f"{'':>18}  delta {max(0.0, p50 - prev) * 1e3:8.2f} ms", file=sys.stderr)
        prev = p50

    full = jax.jit(lambda p, x: jnp.sum(model.apply({"params": p}, x)))
    timed("full tower", lambda: np.asarray(full(params, x)))


if __name__ == "__main__":
    main(parse_cli(Args, prog="profile_vision.py"))
