#!/usr/bin/env python
"""Merge trained LoRA adapters into a deployable base checkpoint.

A policy trained with ``--lora-rank N`` saves its adapters inside the policy
checkpoint (the ``"lora"`` tree rides ``policy_state_dict.safetensors``).
Serving can mount those adapters at runtime (``serve.py --lora-dir``,
``GenerationServer(lora=...)``) — zero base mutation, multi-tenant capable —
or, when one adapter owns the deployment, fold them into the base weights so
the serving program is byte-identical to an unadapted model:

    python scripts/merge_lora.py --checkpoint out/checkpoints/step-100 \
        --output out/merged

``merge_lora`` is exact ``W + A @ B`` (the alpha/rank scale is pre-folded
into A — ``io/lora.py``); quantized bases are refused by design — re-run the
merge on the float checkpoint and let the serving CLI re-quantize
(``--quantization int8`` quantizes at load time).

No reference counterpart: the reference has no adapters (its backbone is
hard-frozen, reference ``fastvlm_adapter.py:501``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import _bootstrap  # noqa: F401

from vla_fastvlm_tpu.utils import configure_logging
from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class MergeArgs:
    # Policy checkpoint dir (policy_config.json + policy_state_dict
    # .safetensors) trained with lora_rank > 0.
    checkpoint: str = ""
    # Output checkpoint dir: same layout, adapters folded, lora_rank=0.
    output: str = ""
    # Merging is host-side tree math; "cpu" avoids dispatching the fold
    # einsums to a (possibly tunneled) accelerator.
    device: str = "cpu"


def main(args: MergeArgs) -> None:
    configure_logging()
    if not args.checkpoint or not args.output:
        raise SystemExit("--checkpoint and --output are required")
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    from vla_fastvlm_tpu.io.checkpoint import (
        load_policy_state,
        save_policy_checkpoint,
    )
    from vla_fastvlm_tpu.io.lora import lora_num_params, merge_lora

    config, params = load_policy_state(args.checkpoint)
    if "lora" not in params:
        raise SystemExit(
            f"{args.checkpoint} holds no 'lora' adapters "
            "(trained without --lora-rank?)"
        )
    lora = params.pop("lora")
    params["backbone"] = merge_lora(params["backbone"], lora)
    # The merged checkpoint is a plain policy: loading it must not re-mount
    # (fresh, untrained) adapters.
    config = dict(config)
    config["lora_rank"] = 0
    save_policy_checkpoint(Path(args.output), config, params)
    print(
        json.dumps(
            {
                "merged_from": args.checkpoint,
                "output": args.output,
                "adapter_params": lora_num_params(lora),
            }
        )
    )


if __name__ == "__main__":
    main(parse_cli(MergeArgs, prog="merge_lora.py"))
