#!/usr/bin/env python
"""Offline dataset evaluation CLI.

Parity with reference ``scripts/eval_dataset.py``: same ``EvalArgs`` flags
(reference ``eval_dataset.py:16-25``), checkpoint load + policy dispatch
(``:30``), validation->train split fallback gated by ``allow_missing_split``
(``:34-61``), sample-weighted dataset MSE loop and final print (``:69-77``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import _bootstrap  # noqa: F401  (repo-root sys.path for uninstalled use)

from vla_fastvlm_tpu.data import (
    AlohaDataset,
    AlohaIterableDataset,
    SyntheticAlohaSource,
    create_aloha_dataloader,
)
from vla_fastvlm_tpu.device import move_batch_to_device
from vla_fastvlm_tpu.utils import configure_logging, load_policy_from_checkpoint
from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class EvalArgs:
    checkpoint_dir: str = "outputs/train/aloha_fastvlm/checkpoints/step-1000"
    dataset_repo_id: str = "lerobot/aloha_sim_insertion_human_image"
    split: str = "validation"
    allow_missing_split: bool = True
    streaming: bool = False
    batch_size: int = 8
    num_workers: int = 4
    limit_samples: Optional[int] = None

    # --- TPU-native extras (offline smoke) ---
    synthetic_data: bool = False
    synthetic_samples: int = 64
    synthetic_image_size: int = 64
    state_dim: int = 14
    action_dim: int = 14
    # Must match the training run's --seed: the synthetic source generates
    # its records FROM this seed, so a mismatch silently evaluates a
    # different random dataset (the noise floor — synthetic actions are IID
    # noise). scripts/train.py defaults to 42; so does this.
    seed: int = 42
    device: Optional[str] = None


def _build_dataset(args: EvalArgs):
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
    # With an in-memory synthetic source the split arg is ignored
    # (AlohaDataset serves the source records directly) — label the output
    # honestly: these are the SAME records training saw (memorization MSE;
    # synthetic actions are IID noise, so a held-out split would measure
    # only the noise floor).
    resolved_split = "synthetic(train-records)" if args.synthetic_data else args.split

    def make(split):
        if args.streaming and not args.synthetic_data:
            return AlohaIterableDataset(split=split, repo_id=args.dataset_repo_id)
        return AlohaDataset(
            split=split,
            repo_id=args.dataset_repo_id,
            limit_samples=args.limit_samples,
            source=synthetic,
        )

    try:
        dataset = make(args.split)
    except ValueError as exc:
        if args.allow_missing_split and "Unknown split" in str(exc):
            resolved_split = "train"
            dataset = make(resolved_split)
            print(
                f"[eval_dataset] Split '{args.split}' not found; using "
                f"'{resolved_split}' instead."
            )
        else:
            raise
    return dataset, resolved_split


def main(args: EvalArgs) -> None:
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    configure_logging()
    from vla_fastvlm_tpu.device import enable_compilation_cache

    enable_compilation_cache()
    policy, device = load_policy_from_checkpoint(args.checkpoint_dir)

    dataset, resolved_split = _build_dataset(args)
    dataloader = create_aloha_dataloader(
        dataset,
        batch_size=args.batch_size,
        shuffle=False,
        num_workers=args.num_workers,
    )

    # Sample-weighted aggregation over EVERY scalar the policy's loss
    # reports — "mse" exists for both head families (the reference's metric,
    # reference eval_dataset.py:69-77); the token policy additionally
    # reports "token_accuracy" + CE "loss" (fastvla/token_policy.py).
    totals: dict = {}
    total_samples = 0
    # Token-head binning floor: the best MSE ANY predictor of discretized
    # actions can reach is the encode->decode round-trip error of the
    # targets themselves — report it next to the model's MSE so the two
    # head families compare honestly (fastvla/action_tokenizer.py).
    action_tokenizer = getattr(policy, "tokenizer", None)
    import numpy as np

    for batch in dataloader:
        tensor_batch = move_batch_to_device(batch, device)
        outputs = policy.compute_loss(tensor_batch)
        n = batch["actions"].shape[0]
        for key, value in outputs.items():
            totals[key] = totals.get(key, 0.0) + float(value) * n
        if action_tokenizer is not None and hasattr(action_tokenizer, "encode"):
            acts = np.asarray(batch["actions"], np.float32).reshape(n, -1)
            rt = action_tokenizer.decode(action_tokenizer.encode(acts))
            totals["binning_floor_mse"] = totals.get(
                "binning_floor_mse", 0.0
            ) + float(np.mean(np.square(rt - acts))) * n
        total_samples += n

    mse = totals.get("mse", 0.0) / max(total_samples, 1)
    print(f"MSE on split '{resolved_split}': {mse:.6f}")
    extras = {
        key: round(value / max(total_samples, 1), 6)
        for key, value in sorted(totals.items())
        if key != "mse"
    }
    if extras:
        print(f"Additional metrics on split '{resolved_split}': {extras}")


if __name__ == "__main__":
    main(parse_cli(EvalArgs, prog="eval_dataset.py"))
