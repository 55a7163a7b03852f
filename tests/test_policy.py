"""Policy-stack tests: adapter, FastVLA policy, legacy policy, tokenizer.

Covers the reference's parity contract (SURVEY.md §2.4 #3): the Python API
``FastVLAPolicy.forward/compute_loss/select_action/reset``,
``FastVLMBackbone.forward``, and the config-resolution rules.
"""

import numpy as np
import pytest

from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy
from vla_fastvlm_tpu.io.model_loader import infer_size_from_tower_name
from vla_fastvlm_tpu.io.tokenizer import ByteTokenizer
from vla_fastvlm_tpu.model import FastVLMBackbone, FastVLMBackboneConfig


TINY = dict(
    vlm_model_name="fastvlm-tiny",
    bootstrap_model_name="fastvlm-tiny",
    state_dim=6,
    action_dim=5,
    hidden_dim=16,
    fusion_dim=16,
    tokenizer_max_length=16,
)


@pytest.fixture(scope="module")
def tiny_policy():
    return FastVLAPolicy(FastVLAConfig(**TINY))


class TestTowerNameRegex:
    """Behavior table from reference ``fastvlm_adapter.py:300-335``."""

    @pytest.mark.parametrize(
        "name,expected",
        [
            ("mobileclip_l_1024", 1024),
            ("openai/clip-vit-large-patch14-336", 336),
            ("siglip-so400m-patch14-384", 384),
            ("vit-base-patch16-224", 224),
            ("tower-48", None),  # below plausible range
            ("so400m", None),  # scale token, not resolution
            ("no-numbers-here", None),
            (None, None),
            (123, None),
        ],
    )
    def test_cases(self, name, expected):
        assert infer_size_from_tower_name(name) == expected


class TestBackboneAdapter:
    def test_forward_shapes(self):
        backbone = FastVLMBackbone(
            FastVLMBackboneConfig(
                model_id="fastvlm-tiny", tokenizer_max_length=16
            )
        )
        imgs = np.random.default_rng(0).random((2, 3, 48, 48), dtype=np.float32)
        feats = backbone.forward(imgs, ["pick up the cube\n", "push the block\n"])
        assert feats.shape == (2, backbone.output_dim)

    def test_force_size_guard(self):
        # Local checkpoints declaring a tower size reject smaller force sizes
        # (reference ``fastvlm_adapter.py:144-154``). Presets declare none, so
        # build a fake local checkpoint dir.
        import json
        import tempfile
        from pathlib import Path

        with tempfile.TemporaryDirectory() as tmp:
            cfg = {
                "model_type": "llava_qwen2",
                "hidden_size": 64,
                "num_hidden_layers": 2,
                "num_attention_heads": 4,
                "num_key_value_heads": 2,
                "intermediate_size": 128,
                "vocab_size": 512,
                "mm_vision_tower": "mobileclip_l_1024",
            }
            Path(tmp, "config.json").write_text(json.dumps(cfg))
            with pytest.raises(ValueError, match="too small"):
                FastVLMBackbone(
                    FastVLMBackboneConfig(
                        model_id=tmp,
                        bootstrap_model_id="fastvlm-tiny",
                        force_image_size=512,
                    )
                )

    def test_as_bchw_accepts_pil_and_mixed_layouts(self):
        from PIL import Image

        backbone = FastVLMBackbone(
            FastVLMBackboneConfig(model_id="fastvlm-tiny", tokenizer_max_length=16)
        )
        rng = np.random.default_rng(0)
        pil = Image.fromarray(
            rng.integers(0, 255, (40, 50, 3), dtype=np.uint8), mode="RGB"
        )
        out = backbone._as_bchw([pil, pil])
        assert out.shape == (2, 3, 40, 50)
        # BHWC auto-transpose
        bhwc = rng.random((2, 40, 50, 3), dtype=np.float32)
        assert backbone._as_bchw(bhwc).shape == (2, 3, 40, 50)
        # CHW single image
        chw = rng.random((3, 8, 8), dtype=np.float32)
        assert backbone._as_bchw(chw).shape == (1, 3, 8, 8)
        # grayscale HW
        hw = rng.random((8, 8), dtype=np.float32)
        assert backbone._as_bchw([hw]).shape == (1, 1, 8, 8)

    def test_text_only_parity_mode(self):
        backbone = FastVLMBackbone(
            FastVLMBackboneConfig(
                model_id="fastvlm-tiny",
                tokenizer_max_length=16,
                image_token_mode="none",
            )
        )
        imgs = np.zeros((1, 3, 32, 32), dtype=np.float32)
        f1 = backbone.forward(imgs, ["task a\n"])
        f2 = backbone.forward(np.ones_like(imgs), ["task a\n"])
        # Strict reference parity: features ignore the image entirely.
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))


class TestFastVLAPolicy:
    def test_forward_action_shape(self, tiny_policy):
        imgs = np.zeros((2, 3, 48, 48), dtype=np.float32)
        states = np.zeros((2, 6), dtype=np.float32)
        actions = tiny_policy.forward(imgs, states, "pick it up")
        assert actions.shape == (2, 5)

    def test_time_major_squeeze(self, tiny_policy):
        # (B, T, C, H, W) images and (B, T, D) states use the last step
        # (reference ``processor_fastvla.py:32-40``).
        rng = np.random.default_rng(0)
        imgs_t = rng.random((1, 3, 3, 48, 48), dtype=np.float32)
        states_t = rng.random((1, 3, 6), dtype=np.float32)
        a_t = tiny_policy.forward(imgs_t, states_t, "go")
        a_last = tiny_policy.forward(imgs_t[:, -1], states_t[:, -1], "go")
        np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_last), rtol=1e-5)

    def test_compute_loss_keys(self, tiny_policy):
        batch = {
            "images": np.zeros((2, 3, 48, 48), dtype=np.float32),
            "states": np.zeros((2, 6), dtype=np.float32),
            "actions": np.zeros((2, 5), dtype=np.float32),
            "tasks": ["a", "b"],
        }
        out = tiny_policy.compute_loss(batch)
        assert set(out) == {"loss", "mse"}
        assert float(out["loss"]) >= 0.0

    def test_select_action_single(self, tiny_policy):
        img = np.zeros((3, 48, 48), dtype=np.float32)
        state = np.zeros((6,), dtype=np.float32)
        action = tiny_policy.select_action(img, state, "grab")
        assert action.shape == (5,)
        tiny_policy.reset()  # no-op, API parity

    def test_task_broadcast_and_newline(self, tiny_policy):
        tasks = tiny_policy.processor.normalize_tasks("do it", batch_size=3)
        assert tasks == ["do it\n"] * 3
        tasks = tiny_policy.processor.normalize_tasks(["x\n"], batch_size=2)
        assert tasks == ["x\n", "x\n"]

    def test_trainable_params_head_only(self, tiny_policy):
        trainable = tiny_policy.trainable_params()
        assert set(trainable) == {"head"}
        frozen = tiny_policy.frozen_params()
        assert set(frozen) == {"backbone"}


class TestLegacyPolicy:
    def test_forward_and_loss(self):
        from vla_fastvlm_tpu.model.fastvlm_adapter import FastVLMBackboneConfig
        from vla_fastvlm_tpu.model.policy import FastVLMPolicy, FastVLMPolicyConfig

        policy = FastVLMPolicy(
            FastVLMPolicyConfig(
                backbone=FastVLMBackboneConfig(
                    model_id="fastvlm-tiny", tokenizer_max_length=16
                ),
                state_dim=4,
                action_dim=3,
                hidden_dim=8,
                fusion_dim=8,
            )
        )
        imgs = np.zeros((2, 3, 32, 32), dtype=np.float32)
        states = np.zeros((2, 4), dtype=np.float32)
        actions = policy.forward(imgs, states, "t")
        assert actions.shape == (2, 3)
        with pytest.raises(ValueError, match=r"\(B,C,H,W\)"):
            policy.forward(np.zeros((3, 32, 32), dtype=np.float32), states, "t")
        out = policy.compute_loss(
            {"images": imgs, "states": states,
             "actions": np.zeros((2, 3), dtype=np.float32), "tasks": ["t", "t"]}
        )
        assert set(out) == {"loss", "mse"}
        assert policy.select_action(imgs[0], states[0], "t").shape == (3,)


class TestByteTokenizer:
    def test_roundtrip(self):
        tok = ByteTokenizer()
        ids = tok.encode("pick up the red block")
        assert tok.decode(ids) == "pick up the red block"

    def test_padding_modes(self):
        tok = ByteTokenizer()
        batch = tok(["ab", "abcd"], padding="max_length", max_length=10)
        assert batch.input_ids.shape == (2, 10)
        assert batch.attention_mask.sum(axis=1).tolist() == [3, 5]  # bos + bytes
        longest = tok(["ab", "abcd"], padding="longest", max_length=10)
        assert longest.input_ids.shape == (2, 5)

    def test_truncation(self):
        tok = ByteTokenizer()
        batch = tok(["x" * 100], padding="max_length", max_length=8)
        assert batch.input_ids.shape == (1, 8)
        assert batch.attention_mask.sum() == 8

    def test_left_padding(self):
        tok = ByteTokenizer(padding_side="left")
        batch = tok(["ab"], padding="max_length", max_length=6)
        assert batch.attention_mask[0].tolist() == [0, 0, 0, 1, 1, 1]
