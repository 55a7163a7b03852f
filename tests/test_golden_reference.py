"""Golden parity vs the reference PyTorch implementation.

Fixtures in ``tests/golden/`` are recorded from the reference's own torch
code on CPU (``scripts/make_golden.py``, reference at /root/reference with a
stubbed backbone). These tests pin everything around the VLM internals:
letterbox (``fastvlm_adapter.py:36-55``), pooling (``:337-359``), the action
head + MSE loss (``fastvla/fastvlm_with_expert.py:23-54``), the LR schedule
(``trainer.py:233-244``), and task normalization (``processor_fastvla.py:23-30``).
"""

from __future__ import annotations

import json
from pathlib import Path
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


def _load(name: str):
    return np.load(GOLDEN / name)


class TestLetterboxGolden:
    def test_resize_with_pad_matches_torch(self):
        from vla_fastvlm_tpu.ops.image import resize_with_pad

        data = _load("letterbox.npz")
        for i in range(int(data["n_cases"])):
            size, pad = data[f"meta_{i}"]
            ours = resize_with_pad(
                jnp.asarray(data[f"in_{i}"]), int(size), int(size),
                pad_value=float(pad),
            )
            np.testing.assert_allclose(
                np.asarray(ours), data[f"out_{i}"], atol=1e-5,
                err_msg=f"letterbox case {i} (target {int(size)})",
            )


class TestPoolHiddenGolden:
    @pytest.mark.parametrize("mode", ["last_token", "mean_pool"])
    def test_pool_matches_torch(self, mode):
        from vla_fastvlm_tpu.models.fastvlm import pool_hidden

        data = _load("pool_hidden.npz")
        hidden = jnp.asarray(data["hidden"])
        mask = jnp.asarray(data["mask"])
        np.testing.assert_allclose(
            np.asarray(pool_hidden(hidden, mask, mode)),
            data[f"{mode}_masked"], atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(pool_hidden(hidden, None, mode)),
            data[f"{mode}_nomask"], atol=1e-6,
        )


def _torch_head_params(data) -> dict:
    """Map the recorded torch state_dict onto ActionExpertHead's pytree."""

    def w(key):
        return jnp.asarray(data["w__" + key.replace(".", "__")])

    def linear(key):
        return {"kernel": w(f"{key}.weight").T, "bias": w(f"{key}.bias")}

    def layernorm(key):
        return {"scale": w(f"{key}.weight"), "bias": w(f"{key}.bias")}

    return {
        "state_norm": layernorm("state_projection.0"),
        "state_proj": linear("state_projection.1"),
        "fusion_fc1": linear("fusion.0"),
        "fusion_norm": layernorm("fusion.1"),
        "fusion_fc2": linear("fusion.4"),
        "action_head": linear("action_head"),
    }


class TestActionHeadGolden:
    def test_head_forward_and_mse_match_torch(self):
        """Same weights + inputs through our Flax head == reference torch head.

        Covers both reference stacks at once: the legacy policy head
        (``model/policy.py:34-49``) and FastVLMWithExpert
        (``fastvlm_with_expert.py:23-38``) are the same module structure.
        """
        from vla_fastvlm_tpu.models.action_head import ActionExpertHead

        data = _load("head.npz")
        head = ActionExpertHead(
            state_dim=6, action_dim=5, hidden_dim=32, fusion_dim=48,
            dropout=0.1,
        )
        params = _torch_head_params(data)
        pred = head.apply(
            {"params": params},
            jnp.asarray(data["features"]),
            jnp.asarray(data["states"]),
            deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(pred), data["pred"], atol=1e-5)

        mse = jnp.mean((pred - jnp.asarray(data["actions_gt"])) ** 2)
        np.testing.assert_allclose(float(mse), float(data["mse"]), atol=1e-6)


class TestLrScheduleGolden:
    def test_linear_warmup_decay_matches_lambdalr(self):
        from vla_fastvlm_tpu.training.trainer import _linear_warmup_decay

        data = _load("lr_schedule.npz")
        for i in range(int(data["n_cases"])):
            total, ratio = data[f"meta_{i}"]
            schedule = _linear_warmup_decay(
                1.0, int(total), int(int(total) * float(ratio))
            )
            ours = np.array(
                [float(schedule(int(s))) for s in data[f"steps_{i}"]]
            )
            np.testing.assert_allclose(
                ours, data[f"factors_{i}"], atol=1e-6,
                err_msg=f"lr case {i} total={int(total)} ratio={ratio}",
            )


class TestOptimizerGolden:
    def test_optax_chain_matches_torch_adamw(self):
        """Three update steps of optax clip_by_global_norm(1.0) + adamw match
        the reference's clip_grad_norm_ + torch.optim.AdamW trajectory
        (reference trainer.py:60-66,177-182), including a step whose global
        grad norm exceeds the clip threshold."""
        import optax

        data = _load("optimizer.npz")
        params = {k: jnp.asarray(data[f"p0__{k}"]) for k in ("w", "b")}
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(1e-3, b1=0.9, b2=0.95, eps=1e-8, weight_decay=0.01),
        )
        state = tx.init(params)
        for i in range(int(data["n_steps"])):
            grads = {k: jnp.asarray(data[f"g{i}__{k}"]) for k in ("w", "b")}
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            for k in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(params[k]), data[f"s{i}__{k}"],
                    atol=1e-6, err_msg=f"step {i} param {k}",
                )


class TestTaskNormalizationGolden:
    def test_normalize_tasks_matches_reference(self):
        from vla_fastvlm_tpu.fastvla.processor_fastvla import FastVLAProcessor

        cases = json.loads((GOLDEN / "tasks.json").read_text())
        stub = SimpleNamespace(config=SimpleNamespace(add_trailing_newline=True))
        for case in cases:
            out = FastVLAProcessor.normalize_tasks(
                stub, case["tasks"], case["batch"]
            )
            assert out == case["out"], case


@pytest.mark.skipif(
    not Path("/root/reference/src").exists(),
    reason="reference tree not present",
)
class TestLiveReference:
    """Direct live comparison when the reference tree is importable."""

    def test_letterbox_live_random_shapes(self):
        import sys

        sys.path.insert(0, "/root/reference/src")
        try:
            import torch

            from vla_fastvlm.model.fastvlm_adapter import (
                resize_with_pad as torch_rwp,
            )
        finally:
            sys.path.remove("/root/reference/src")
        from vla_fastvlm_tpu.ops.image import resize_with_pad

        rng = np.random.default_rng(7)
        for h, w, size in [(37, 53, 64), (128, 72, 96), (17, 17, 40)]:
            img = rng.random((1, 3, h, w), dtype=np.float32)
            theirs = torch_rwp(torch.from_numpy(img), size, size).numpy()
            ours = np.asarray(resize_with_pad(jnp.asarray(img), size, size))
            np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def _reference_prep(self, normalize=False, resize_with_padding=True,
                        pad_value=0.0, size=56):
        """The reference's _prepare_images_tensor bound to a stub self (no
        model load): exercises _as_bchw -> _normalize_channels ->
        _resize_image -> _maybe_normalize_imagenet (fastvlm_adapter.py:479-488)."""
        import sys

        sys.path.insert(0, "/root/reference/src")
        try:
            import torch

            from vla_fastvlm.model.fastvlm_adapter import FastVLMBackbone
        finally:
            sys.path.remove("/root/reference/src")

        from types import MethodType

        stub = SimpleNamespace(
            config=SimpleNamespace(
                normalize_imagenet=normalize,
                resize_with_padding=resize_with_padding,
                pad_value=pad_value,
            ),
            expected_size=size,
        )
        for name in (
            "_as_bchw", "_normalize_channels", "_resize_image",
            "_maybe_normalize_imagenet", "_prepare_images_tensor",
        ):
            setattr(stub, name, MethodType(getattr(FastVLMBackbone, name), stub))

        def run(images):
            # reference nuance: 4D batches are accepted only as torch
            # tensors (_as_bchw:423); numpy is supported per-image only.
            # That is also what its processor actually feeds it.
            if isinstance(images, np.ndarray) and images.ndim == 4:
                images = torch.from_numpy(images)
            return stub._prepare_images_tensor(images, torch.device("cpu")).numpy()

        return run

    def _ours_prep(self, normalize=False, resize_with_padding=True,
                   pad_value=0.0, size=56):
        from vla_fastvlm_tpu.model.fastvlm_adapter import FastVLMBackbone
        from vla_fastvlm_tpu.ops.image import prepare_image_batch

        def run(images):
            bchw = FastVLMBackbone._as_bchw(None, images)
            return np.asarray(
                prepare_image_batch(
                    jnp.asarray(bchw), size=size,
                    resize_with_padding=resize_with_padding,
                    pad_value=pad_value, normalize=normalize,
                )
            )

        return run

    @pytest.mark.parametrize(
        "case",
        [
            "bchw_batch", "bhwc_batch", "hwc_single", "chw_single",
            "gray_batch", "four_channel", "list_mixed",
        ],
    )
    def test_image_pipeline_live(self, case):
        """Full image prep (layout normalization + channel fix + letterbox)
        matches the reference pipeline for every input format it accepts."""
        rng = np.random.default_rng(11)
        images = {
            "bchw_batch": rng.random((2, 3, 48, 64), dtype=np.float32),
            "bhwc_batch": rng.random((2, 40, 30, 3), dtype=np.float32),
            "hwc_single": rng.random((40, 64, 3), dtype=np.float32),
            "chw_single": rng.random((3, 64, 40), dtype=np.float32),
            "gray_batch": rng.random((2, 1, 48, 48), dtype=np.float32),
            "four_channel": rng.random((1, 4, 48, 64), dtype=np.float32),
            "list_mixed": [
                rng.random((3, 48, 64), dtype=np.float32),
                rng.random((3, 48, 64), dtype=np.float32),
            ],
        }[case]
        theirs = self._reference_prep()(images)
        ours = self._ours_prep()(images)
        np.testing.assert_allclose(ours, theirs, atol=1e-5, err_msg=case)

    @pytest.mark.parametrize("normalize,letterbox", [
        (True, True), (True, False), (False, False),
    ])
    def test_image_pipeline_modes_live(self, normalize, letterbox):
        rng = np.random.default_rng(12)
        images = rng.random((2, 3, 48, 64), dtype=np.float32)  # [0,1] floats
        theirs = self._reference_prep(
            normalize=normalize, resize_with_padding=letterbox
        )(images)
        ours = self._ours_prep(
            normalize=normalize, resize_with_padding=letterbox
        )(images)
        # torchvision normalize computes (x - mean) * (1/std); ours divides —
        # identical math, last-ulp f32 differences.
        np.testing.assert_allclose(ours, theirs, atol=5e-5)
