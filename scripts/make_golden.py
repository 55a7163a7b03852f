"""Generate golden-parity fixtures from the reference PyTorch implementation.

Runs the reference's own torch code (``/root/reference/src``, CPU) with a
stubbed ``FastVLMBackbone`` (fixed pooled features, no checkpoint download)
and records inputs/outputs for everything around the VLM internals:

- ``letterbox.npz``   — ``resize_with_pad`` (reference ``fastvlm_adapter.py:36-55``)
- ``pool_hidden.npz`` — ``_pool_hidden`` last_token/mean_pool (``:337-359``)
- ``head.npz``        — ``FastVLMWithExpert`` head math incl. torch weights
                        (``fastvla/fastvlm_with_expert.py:23-54``; same head as
                        legacy ``model/policy.py:34-49``) + the MSE loss value
- ``lr_schedule.npz`` — the LambdaLR warmup/decay factors (``trainer.py:233-244``)
- ``tasks.json``      — task normalization strings (``processor_fastvla.py:23-30``,
                        ``model/policy.py:51-61``)

The fixtures are checked into ``tests/golden/`` so the parity tests run
without the reference tree; re-run this script if the fixtures need
regeneration (requires ``/root/reference`` or ``--reference-src``).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "golden"


def _add_reference(src: str) -> None:
    if src not in sys.path:
        sys.path.insert(0, src)


def make_letterbox(torch):
    from vla_fastvlm.model.fastvlm_adapter import resize_with_pad

    rng = np.random.default_rng(0)
    cases = [
        # (B, C, H, W, target, pad_value): downscale wide (camera 3:4 aspect),
        # downscale extreme-wide, upscale tall, exact identity, mild downscale.
        # Sizes are kept small — the bilinear + top/left-pad math the fixture
        # pins (half-pixel centers, truncating int resize dims) is
        # size-independent, and the repo-checked npz must stay small.
        (2, 3, 48, 64, 56, 0.0),
        (1, 3, 10, 30, 24, 0.0),
        (2, 3, 64, 48, 96, 0.5),
        (1, 3, 64, 64, 64, 0.0),
        (1, 3, 96, 128, 112, 0.0),
    ]
    blobs = {}
    for i, (b, c, h, w, size, pad) in enumerate(cases):
        img = rng.random((b, c, h, w), dtype=np.float32)
        out = resize_with_pad(torch.from_numpy(img), size, size, pad_value=pad)
        blobs[f"in_{i}"] = img
        blobs[f"out_{i}"] = out.numpy()
        blobs[f"meta_{i}"] = np.array([size, pad], dtype=np.float32)
    blobs["n_cases"] = np.array(len(cases))
    np.savez_compressed(GOLDEN_DIR / "letterbox.npz", **blobs)


def make_pool_hidden(torch):
    from vla_fastvlm.model.fastvlm_adapter import FastVLMBackbone

    rng = np.random.default_rng(1)
    hidden = rng.standard_normal((3, 7, 16)).astype(np.float32)
    mask = np.zeros((3, 7), np.int64)
    for row, length in enumerate((7, 4, 1)):
        mask[row, :length] = 1
    blobs = {"hidden": hidden, "mask": mask}
    th, tm = torch.from_numpy(hidden), torch.from_numpy(mask)
    for mode in ("last_token", "mean_pool"):
        blobs[f"{mode}_masked"] = FastVLMBackbone._pool_hidden(th, tm, mode).numpy()
        blobs[f"{mode}_nomask"] = FastVLMBackbone._pool_hidden(th, None, mode).numpy()
    np.savez_compressed(GOLDEN_DIR / "pool_hidden.npz", **blobs)


def make_head(torch):
    import vla_fastvlm.fastvla.fastvlm_with_expert as fwe
    from vla_fastvlm.fastvla.configuration_fastvla import FastVLAConfig

    feat_dim = 16

    class StubBackbone(torch.nn.Module):
        """Returns preset pooled features; never touches HF/network."""

        def __init__(self, _cfg):
            super().__init__()
            self.output_dim = feat_dim
            self.features = None

        def forward(self, images, tasks, device=None):
            return self.features

    real = fwe.FastVLMBackbone
    fwe.FastVLMBackbone = StubBackbone
    try:
        torch.manual_seed(0)
        model = fwe.FastVLMWithExpert(
            FastVLAConfig(
                vlm_model_name="stub",
                bootstrap_model_name="stub",
                state_dim=6,
                action_dim=5,
                hidden_dim=32,
                fusion_dim=48,
                dropout=0.1,
            )
        )
    finally:
        fwe.FastVLMBackbone = real

    model.eval()  # dropout off, like reference inference / deterministic loss
    rng = np.random.default_rng(2)
    features = rng.standard_normal((4, feat_dim)).astype(np.float32)
    states = rng.standard_normal((4, 6)).astype(np.float32)
    actions_gt = rng.standard_normal((4, 5)).astype(np.float32)

    model.backbone.features = torch.from_numpy(features)
    with torch.no_grad():
        pred = model(
            torch.zeros(4, 3, 8, 8), torch.from_numpy(states), ["t\n"] * 4
        )
        mse = torch.nn.functional.mse_loss(pred, torch.from_numpy(actions_gt))

    blobs = {
        "features": features,
        "states": states,
        "actions_gt": actions_gt,
        "pred": pred.numpy(),
        "mse": np.array(mse.item(), np.float32),
    }
    for key, value in model.state_dict().items():
        blobs["w__" + key.replace(".", "__")] = value.numpy()
    np.savez_compressed(GOLDEN_DIR / "head.npz", **blobs)


def make_lr_schedule():
    from vla_fastvlm.training.trainer import Trainer

    blobs = {}
    configs = [(1000, 0.03), (10, 0.5), (100, 0.0)]
    for i, (total, ratio) in enumerate(configs):
        lam = Trainer._build_scheduler_lambda(None, total, ratio)
        steps = np.arange(0, total + 5)
        blobs[f"steps_{i}"] = steps
        blobs[f"factors_{i}"] = np.array([lam(int(s)) for s in steps], np.float64)
        blobs[f"meta_{i}"] = np.array([total, ratio], np.float64)
    blobs["n_cases"] = np.array(len(configs))
    np.savez_compressed(GOLDEN_DIR / "lr_schedule.npz", **blobs)


def make_optimizer(torch):
    """Three steps of the reference's training update — clip_grad_norm_(1.0)
    + torch.optim.AdamW (``trainer.py:60-66,177-182``) — on fixed params and
    gradients. Pins the optax chain's numerics (bias correction, eps
    placement, decoupled weight decay, clip composition)."""
    rng = np.random.default_rng(4)
    shapes = {"w": (8, 6), "b": (6,)}
    params0 = {k: rng.standard_normal(s).astype(np.float32) for k, s in shapes.items()}
    grads = [
        {k: (rng.standard_normal(s) * scale).astype(np.float32)
         for k, s in shapes.items()}
        for scale in (0.5, 3.0, 0.01)  # step 2 exceeds the clip norm
    ]

    tensors = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
               for k, v in params0.items()}
    opt = torch.optim.AdamW(
        tensors.values(), lr=1e-3, betas=(0.9, 0.95), eps=1e-8,
        weight_decay=0.01,
    )
    trajectory = []
    with torch.enable_grad():
        for g in grads:
            opt.zero_grad()
            for k, t in tensors.items():
                t.grad = torch.from_numpy(g[k].copy())
            torch.nn.utils.clip_grad_norm_(tensors.values(), 1.0)
            opt.step()
            trajectory.append({k: t.detach().numpy().copy() for k, t in tensors.items()})

    blobs = {f"p0__{k}": v for k, v in params0.items()}
    for i, g in enumerate(grads):
        for k, v in g.items():
            blobs[f"g{i}__{k}"] = v
    for i, step in enumerate(trajectory):
        for k, v in step.items():
            blobs[f"s{i}__{k}"] = v
    blobs["n_steps"] = np.array(len(grads))
    np.savez_compressed(GOLDEN_DIR / "optimizer.npz", **blobs)


def make_tasks():
    from vla_fastvlm.model.policy import FastVLMPolicy

    cases = [
        ("pick", 3),
        (["pick"], 2),
        (["a", "b\n"], 2),
        ("already\n", 1),
        ("", 2),
    ]
    golden = []
    for tasks, batch in cases:
        out = FastVLMPolicy._normalize_tasks(None, tasks, batch)
        golden.append({"tasks": tasks, "batch": batch, "out": out})
    (GOLDEN_DIR / "tasks.json").write_text(json.dumps(golden, indent=1))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--reference-src", default="/root/reference/src")
    args = parser.parse_args()
    _add_reference(args.reference_src)
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)

    import torch

    torch.set_grad_enabled(False)
    make_letterbox(torch)
    make_pool_hidden(torch)
    make_head(torch)
    make_lr_schedule()
    make_optimizer(torch)
    make_tasks()
    print(f"golden fixtures written to {GOLDEN_DIR}")
    for f in sorted(GOLDEN_DIR.iterdir()):
        print(f"  {f.name}: {f.stat().st_size} bytes")


if __name__ == "__main__":
    main()
