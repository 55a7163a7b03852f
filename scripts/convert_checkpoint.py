#!/usr/bin/env python
"""Convert an Apple FastVLM (llava_qwen2) checkpoint to this framework's
native policy format.

Reads a local HF checkpoint directory (config.json + *.safetensors), converts
decoder/projector weights exactly and the vision tower via the
reparameterization fold, wraps them with a freshly initialized action head,
and writes a reference-layout checkpoint directory
(policy_config.json + policy_state_dict.safetensors) loadable by
``load_policy_from_checkpoint`` / ``scripts/eval_dataset.py``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import _bootstrap  # noqa: F401

from vla_fastvlm_tpu.utils import configure_logging
from vla_fastvlm_tpu.utils.cli import parse_cli

logger = logging.getLogger(__name__)


@dataclass
class ConvertArgs:
    checkpoint_dir: str = "checkpoints/llava-fastvithd_0.5b_stage3"
    output_dir: str = "outputs/converted/fastvla_policy"
    state_dim: int = 14
    action_dim: int = 14
    hidden_dim: int = 1024
    fusion_dim: int = 1024
    image_size: Optional[int] = None
    dtype: str = "float32"
    device: Optional[str] = None
    seed: int = 0


def main(args: ConvertArgs) -> None:
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    configure_logging()

    from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy
    from vla_fastvlm_tpu.io.checkpoint import save_policy_checkpoint

    config = FastVLAConfig(
        vlm_model_name=args.checkpoint_dir,
        bootstrap_model_name=args.checkpoint_dir,
        state_dim=args.state_dim,
        action_dim=args.action_dim,
        hidden_dim=args.hidden_dim,
        fusion_dim=args.fusion_dim,
        image_size=args.image_size,
        dtype=args.dtype,
        param_dtype=args.dtype,
        seed=args.seed,
    )
    policy = FastVLAPolicy(config)  # loads + converts the checkpoint weights
    save_policy_checkpoint(args.output_dir, config, policy.params)
    logger.info("Wrote converted policy checkpoint to %s", args.output_dir)


if __name__ == "__main__":
    main(parse_cli(ConvertArgs, prog="convert_checkpoint.py"))
