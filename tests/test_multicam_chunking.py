"""Multi-camera encoding + action chunking (BASELINE.json config #4)."""

import numpy as np
import pytest

from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy
from vla_fastvlm_tpu.models import fastvlm_tiny


def test_num_image_tokens_scales_with_cameras():
    cfg = fastvlm_tiny()
    assert cfg.num_image_tokens == 1
    assert cfg.replace(num_cameras=3).num_image_tokens == 3


@pytest.fixture(scope="module")
def multicam_policy():
    return FastVLAPolicy(
        FastVLAConfig(
            vlm_model_name="fastvlm-tiny",
            bootstrap_model_name="fastvlm-tiny",
            state_dim=4,
            action_dim=4,
            hidden_dim=16,
            fusion_dim=16,
            tokenizer_max_length=16,
            num_cameras=2,
            chunk_size=3,
            dropout=0.0,
        )
    )


class TestMultiCamera:
    def test_forward_shape(self, multicam_policy):
        imgs = np.zeros((2, 2, 3, 48, 48), np.float32)  # (B, ncam, C, H, W)
        states = np.zeros((2, 4), np.float32)
        actions = multicam_policy.forward(imgs, states, "grab")
        assert actions.shape == (2, 3, 4)  # (B, chunk, action_dim)

    def test_second_camera_affects_output(self, multicam_policy):
        states = np.zeros((1, 4), np.float32)
        imgs_a = np.zeros((1, 2, 3, 48, 48), np.float32)
        imgs_b = imgs_a.copy()
        imgs_b[:, 1] = 1.0  # change only camera 2
        a = multicam_policy.forward(imgs_a, states, "t")
        b = multicam_policy.forward(imgs_b, states, "t")
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_time_major_multicam_squeeze(self, multicam_policy):
        rng = np.random.default_rng(0)
        imgs_t = rng.random((1, 2, 2, 3, 48, 48), dtype=np.float32)  # (B,T,ncam,...)
        states = np.zeros((1, 4), np.float32)
        a_t = multicam_policy.forward(imgs_t, states, "t")
        a_last = multicam_policy.forward(imgs_t[:, -1], states, "t")
        np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_last), rtol=1e-5)

    def test_chunked_loss_uses_full_chunk(self, multicam_policy):
        batch = {
            "images": np.zeros((2, 2, 3, 48, 48), np.float32),
            "states": np.zeros((2, 4), np.float32),
            "actions": np.zeros((2, 3, 4), np.float32),  # (B, chunk, D)
            "tasks": ["a", "b"],
        }
        out = multicam_policy.compute_loss(batch)
        assert float(out["loss"]) >= 0.0
