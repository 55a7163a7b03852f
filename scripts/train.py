#!/usr/bin/env python
"""Standalone training CLI.

Parity with reference ``scripts/train.py``: same ``TrainArgs`` flag set
(reference ``train.py:24-59``) exposed as ``--kebab-case`` flags (tyro-style;
``vla_fastvlm_tpu.utils.cli`` provides the parser since tyro is not a baked-in
dependency), same construction flow (config -> policy -> datasets -> Trainer)
(reference ``train.py:62-148``), including the "Unknown split" eval tolerance
(``train.py:117-126``).

TPU additions: ``--synthetic-data`` runs the exact pipeline on an in-memory
LeRobot-schema dataset (offline smoke), ``--dtype`` selects bf16 compute, and
``--image-token-mode`` picks the multimodal splice ("prefix") vs strict
reference text-only parity ("none").
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import _bootstrap  # noqa: F401  (repo-root sys.path for uninstalled use)

from vla_fastvlm_tpu.data import (
    AlohaDataset,
    AlohaIterableDataset,
    SyntheticAlohaSource,
    create_aloha_dataloader,
)
from vla_fastvlm_tpu.fastvla import (
    FastVLAConfig,
    FastVLAPolicy,
    FastVLMTokenPolicy,
)
from vla_fastvlm_tpu.training import Trainer, TrainingConfig
from vla_fastvlm_tpu.utils import configure_logging
from vla_fastvlm_tpu.utils.cli import parse_cli

logger = logging.getLogger(__name__)


@dataclass
class TrainArgs:
    output_dir: str = "outputs/train/aloha_fastvlm"
    dataset_repo_id: str = "lerobot/aloha_sim_insertion_human_image"
    train_split: str = "train"
    eval_split: Optional[str] = "validation"
    streaming: bool = False
    limit_train_samples: Optional[int] = None
    limit_eval_samples: Optional[int] = 1024
    batch_size: int = 4
    eval_batch_size: int = 4
    num_workers: int = 4

    model_id: str = "apple/FastVLM-0.5B"
    bootstrap_model_id: str = "apple/FastVLM-0.5B"
    freeze_backbone: bool = True
    hidden_dim: int = 1024
    fusion_dim: int = 1024
    dropout: float = 0.1
    image_size: Optional[int] = None
    resize_with_padding: bool = True
    pad_value: float = 0.0
    tokenizer_max_length: int = 64
    tokenizer_padding_side: str = "right"
    pad_to_max_length: bool = False

    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    num_epochs: int = 5
    max_steps: Optional[int] = None
    gradient_accumulation_steps: int = 1
    logging_steps: int = 50
    eval_steps: int = 500
    save_steps: int = 1000
    mixed_precision: Optional[str] = "bf16"
    seed: int = 42

    # --- TPU-native extras ---
    state_dim: int = 14
    action_dim: int = 14
    dtype: str = "float32"
    image_token_mode: str = "prefix"
    synthetic_data: bool = False
    synthetic_samples: int = 64
    synthetic_image_size: int = 64
    # Backend override: "tpu" (default platform), "cpu" for local smoke runs.
    # The env may pin JAX_PLATFORMS before interpreter start, so this goes
    # through jax.config (same trick as tests/conftest.py).
    device: Optional[str] = None
    # Mesh axes: dp * tp must equal the device count (dp=-1 = absorb all
    # devices not taken by tp). tp>1 shards the Qwen2 decoder (7B path).
    dp: int = -1
    tp: int = 1
    # FSDP (ZeRO-3-style): shard params/grads/optimizer state over the data
    # axis too — the memory story for --train-backbone at 7B scale
    # (TrainingConfig.fsdp; parallel/sharding.py::fsdp_param_shardings).
    fsdp: bool = False
    # LoRA fine-tuning (io/lora.py): rank > 0 trains low-rank decoder
    # adapters + the head over a frozen base (QLoRA with --quantization
    # int8: quantized frozen 7B base + float adapters on one chip).
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    # Frozen-base weight quantization for QLoRA ("none" | "int8" | "int4").
    quantization: str = "none"
    # "token" trains the autoregressive action-token policy
    # (fastvla/token_policy.py — RT-2/OpenVLA-style discretized actions
    # decoded through the VLM's lm_head; requires --lora-rank > 0 or
    # --train-backbone since it has no head parameters).
    action_head: str = "mlp"
    action_bins: int = 256
    # Codebook clip range for the token head. Actions/states are expected
    # normalized (~N(0,1) after LeRobot MEAN_STD); the default +/-1 range
    # clips ~32% of an N(0,1) mass — widen (e.g. +/-4) when training on
    # unsquashed normalized actions or the clipping error floors the MSE.
    action_token_low: float = -1.0
    action_token_high: float = 1.0


def main(args: TrainArgs) -> None:
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    configure_logging()
    from vla_fastvlm_tpu.device import enable_compilation_cache

    enable_compilation_cache()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)

    policy_config = FastVLAConfig(
        vlm_model_name=args.model_id,
        bootstrap_model_name=args.bootstrap_model_id,
        freeze_backbone=args.freeze_backbone,
        state_dim=args.state_dim,
        action_dim=args.action_dim,
        hidden_dim=args.hidden_dim,
        fusion_dim=args.fusion_dim,
        dropout=args.dropout,
        image_size=args.image_size,
        resize_with_padding=args.resize_with_padding,
        pad_value=args.pad_value,
        tokenizer_max_length=args.tokenizer_max_length,
        tokenizer_padding_side=args.tokenizer_padding_side,
        pad_to_max_length=args.pad_to_max_length,
        dtype=args.dtype,
        param_dtype=args.dtype if args.dtype != "bfloat16" else "float32",
        image_token_mode=args.image_token_mode,
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        quantization=args.quantization,
        action_head=args.action_head,
        action_bins=args.action_bins,
        action_token_low=args.action_token_low,
        action_token_high=args.action_token_high,
        seed=args.seed,
    )
    if args.action_head == "token":
        policy = FastVLMTokenPolicy(policy_config)
    else:
        policy = FastVLAPolicy(policy_config)

    synthetic = (
        SyntheticAlohaSource(
            num_samples=args.synthetic_samples,
            image_hw=(args.synthetic_image_size, args.synthetic_image_size),
            state_dim=args.state_dim,
            action_dim=args.action_dim,
            seed=args.seed,
        )
        if args.synthetic_data
        else None
    )

    if args.streaming and not args.synthetic_data:
        train_dataset = AlohaIterableDataset(
            split=args.train_split, repo_id=args.dataset_repo_id
        )
    else:
        train_dataset = AlohaDataset(
            split=args.train_split,
            repo_id=args.dataset_repo_id,
            limit_samples=args.limit_train_samples,
            source=synthetic,
        )
    import jax

    # Per-host sharded loading: each host reads its slice of the global batch
    # (multi-host DP; no-op on a single host).
    train_loader = create_aloha_dataloader(
        train_dataset,
        batch_size=args.batch_size,
        shuffle=not args.streaming,
        num_workers=args.num_workers,
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
    )

    eval_loader = None
    if args.eval_split:
        try:
            if args.streaming and not args.synthetic_data:
                eval_dataset = AlohaIterableDataset(
                    split=args.eval_split, repo_id=args.dataset_repo_id
                )
            else:
                eval_dataset = AlohaDataset(
                    split=args.eval_split,
                    repo_id=args.dataset_repo_id,
                    limit_samples=args.limit_eval_samples,
                    source=synthetic,
                )
            eval_loader = create_aloha_dataloader(
                eval_dataset,
                batch_size=args.eval_batch_size,
                shuffle=False,
                num_workers=args.num_workers,
            )
        except ValueError as exc:
            if "Unknown split" in str(exc):
                logger.warning(
                    "Eval split '%s' not found for dataset %s; continuing "
                    "without evaluation.",
                    args.eval_split,
                    args.dataset_repo_id,
                )
                eval_loader = None
            else:
                raise

    trainer_config = TrainingConfig(
        output_dir=args.output_dir,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        num_epochs=args.num_epochs,
        max_steps=args.max_steps,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        logging_steps=args.logging_steps,
        eval_steps=args.eval_steps,
        save_steps=args.save_steps,
        mixed_precision=args.mixed_precision,
        seed=args.seed,
        fsdp=args.fsdp,
    )

    mesh = None
    if args.tp > 1 or len(jax.devices()) > 1:
        from vla_fastvlm_tpu.parallel import make_mesh

        mesh = make_mesh(data=args.dp, model=args.tp)
        logger.info("Training on mesh %s", dict(mesh.shape))

    trainer = Trainer(
        model=policy,
        train_dataloader=train_loader,
        eval_dataloader=eval_loader,
        config=trainer_config,
        mesh=mesh,
    )
    trainer.fit()


if __name__ == "__main__":
    main(parse_cli(TrainArgs, prog="train.py"))
