"""Execute the LeRobot plugin against the API stub (tests/lerobot_stub).

Round-1 gap (VERDICT §2.1): the plugin code existed but had never executed —
LeRobot is not installable offline. The stub reproduces the exact API surface
the plugin consumes, so these tests drive the real plugin modules end to end:
registration of ``policy.type=fastvla`` (reference
``lerobot_fastvla/configuration_fastvla.py:11``), feature-key resolution and
dim inference (reference ``modeling_fastvla.py:53-73``), the action queue
(reference ``:78-125``), training ``forward -> (loss, dict)`` (reference
``:127-133``) through the torch<->JAX bridge, and the pre/post processor
pipelines (reference ``processor_fastvla.py:22-48``).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

_STUB = str(Path(__file__).parent / "lerobot_stub")


@pytest.fixture(scope="module")
def plugin():
    """Import the plugin with the stub on sys.path; clean up afterwards."""
    saved_modules = {
        name: module
        for name, module in sys.modules.items()
        if name == "lerobot" or name.startswith("lerobot.")
    }
    for name in saved_modules:
        del sys.modules[name]
    sys.path.insert(0, _STUB)
    purge = [
        name
        for name in sys.modules
        if name.startswith("vla_fastvlm_tpu.lerobot_fastvla")
    ]
    for name in purge:
        del sys.modules[name]
    try:
        import vla_fastvlm_tpu.lerobot_fastvla as plugin_pkg

        yield plugin_pkg
    finally:
        sys.path.remove(_STUB)
        for name in [
            name
            for name in sys.modules
            if name == "lerobot"
            or name.startswith("lerobot.")
            or name.startswith("vla_fastvlm_tpu.lerobot_fastvla")
        ]:
            del sys.modules[name]
        sys.modules.update(saved_modules)


@pytest.fixture(scope="module")
def features(plugin):
    from lerobot.configs.types import FeatureType, PolicyFeature

    return {
        "input": {
            "observation.state": PolicyFeature(FeatureType.STATE, (4,)),
            "observation.images.top": PolicyFeature(FeatureType.VISUAL, (3, 64, 64)),
        },
        "output": {"action": PolicyFeature(FeatureType.ACTION, (4,))},
    }


@pytest.fixture(scope="module")
def policy(plugin, features):
    config = plugin.FastVLAConfig(
        input_features=features["input"],
        output_features=features["output"],
        vlm_model_name="fastvlm-tiny",
        bootstrap_model_name="fastvlm-tiny",
        dropout=0.0,
        hidden_dim=32,
        fusion_dim=32,
    )
    return plugin.FastVLAPolicy(config)


def _batch(b=2, with_action=True, time_major=False):
    g = torch.Generator().manual_seed(0)
    img = torch.rand((b, 3, 64, 64), generator=g)
    state = torch.rand((b, 4), generator=g)
    if time_major:
        img = img[:, None]
        state = state[:, None]
    batch = {
        "observation.images.top": img,
        "observation.state": state,
        "task": "stack the cube",
    }
    if with_action:
        batch["action"] = torch.rand((b, 4), generator=g)
    return batch


class TestRegistration:
    def test_policy_type_registered(self, plugin):
        from lerobot.configs.policies import PreTrainedConfig

        assert PreTrainedConfig.get_choice_class("fastvla") is plugin.FastVLAConfig
        assert plugin.FastVLAConfig.type == "fastvla"

    def test_exports(self, plugin):
        # Parity: reference lerobot_fastvla/__init__.py:7-11.
        assert hasattr(plugin, "FastVLAConfig")
        assert hasattr(plugin, "FastVLAPolicy")
        assert hasattr(plugin, "make_fastvla_pre_post_processors")

    def test_optimizer_scheduler_presets(self, plugin):
        # Reference configuration_fastvla.py:79-94 preset values.
        cfg = plugin.FastVLAConfig()
        opt = cfg.get_optimizer_preset()
        assert (opt.lr, opt.betas, opt.weight_decay, opt.grad_clip_norm) == (
            1e-4,
            (0.9, 0.95),
            1e-4,
            1.0,
        )
        sched = cfg.get_scheduler_preset()
        assert sched.num_warmup_steps == 500
        assert sched.num_decay_steps == 20_000
        assert sched.decay_lr == 2.5e-6

    def test_feature_validation(self, plugin, features):
        cfg = plugin.FastVLAConfig(
            input_features={"observation.state": features["input"]["observation.state"]},
            output_features=features["output"],
        )
        with pytest.raises(ValueError, match="visual observation"):
            cfg.validate_features()

    def test_delta_indices(self, plugin):
        cfg = plugin.FastVLAConfig(chunk_size=3, n_action_steps=2)
        assert cfg.observation_delta_indices == [0]
        assert cfg.action_delta_indices == [0, 1, 2]
        assert cfg.reward_delta_indices is None


class TestPolicy:
    def test_dims_inferred_from_features(self, policy):
        assert policy.config.state_dim == 4
        assert policy.config.action_dim == 4
        assert policy._state_key == "observation.state"
        assert policy._image_keys == ["observation.images.top"]

    def test_forward_returns_loss_and_metrics(self, policy):
        loss, metrics = policy.forward(_batch())
        assert loss.requires_grad
        assert np.isfinite(loss.item())
        assert set(metrics) == {"loss", "mse"}

    def test_select_action_queue(self, policy):
        policy.reset()
        batch = _batch(with_action=False)
        action = policy.select_action(batch)
        assert action.shape == (2, 4)
        assert torch.isfinite(action).all()

    def test_time_major_batches_squeeze(self, policy):
        chunk = policy.predict_action_chunk(_batch(with_action=False, time_major=True))
        assert chunk.shape == (2, 1, 4)

    def test_one_optimizer_step_changes_loss(self, policy):
        opt = torch.optim.AdamW(policy.get_optim_params(), lr=1e-2)
        batch = _batch()
        loss0, _ = policy.forward(batch)
        opt.zero_grad()
        loss0.backward()
        grads = [p.grad for p in policy.get_optim_params() if p.grad is not None]
        assert grads, "bridge returned no gradients"
        opt.step()
        loss1, _ = policy.forward(batch)
        assert loss1.item() != pytest.approx(loss0.item())


class TestProcessors:
    def test_pipelines_execute(self, plugin, features, policy):
        stats = {
            "observation.state": {
                "mean": torch.zeros(4) + 0.5,
                "std": torch.ones(4) * 2.0,
            },
            "action": {"mean": torch.ones(4), "std": torch.ones(4) * 3.0},
        }
        pre, post = plugin.make_fastvla_pre_post_processors(policy.config, stats)
        # Reference processor_fastvla.py:30-40 step order.
        names = [type(step).__name__ for step in pre.steps]
        assert names == [
            "RenameObservationsProcessorStep",
            "AddBatchDimensionProcessorStep",
            "DeviceProcessorStep",
            "NormalizerProcessorStep",
        ]
        obs = {
            "observation.images.top": torch.rand(3, 64, 64),
            "observation.state": torch.zeros(4) + 1.5,
            "task": "pick",
        }
        out = pre(obs)
        assert out["observation.images.top"].shape == (1, 3, 64, 64)
        # MEAN_STD state: (1.5 - 0.5) / 2.0 = 0.5; IDENTITY image untouched.
        np.testing.assert_allclose(
            out["observation.state"].numpy(), np.full((1, 4), 0.5), rtol=1e-5
        )

        action = post(torch.ones(1, 4))
        # Unnormalize: 1 * 3 + 1 = 4.
        np.testing.assert_allclose(action.numpy(), np.full((1, 4), 4.0), rtol=1e-5)

    def test_roundtrip_normalization(self, plugin, policy):
        stats = {
            "action": {
                "mean": torch.tensor([1.0, -1.0, 0.0, 2.0]),
                "std": torch.tensor([2.0, 0.5, 1.0, 4.0]),
            }
        }
        pre, post = plugin.make_fastvla_pre_post_processors(policy.config, stats)
        raw = torch.tensor([[3.0, -2.0, 1.0, 0.0]])
        normalized = pre({"action": raw})["action"]
        restored = post(normalized)
        np.testing.assert_allclose(restored.numpy(), raw.numpy(), rtol=1e-4)
