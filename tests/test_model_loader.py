"""Config/weight resolution tests: presets, local checkpoints, bootstrap
semantics (reference ``fastvlm_adapter.py:183-241``)."""

import json

import numpy as np
import pytest

from vla_fastvlm_tpu.io.model_loader import (
    load_fastvlm_params,
    resolve_fastvlm_config,
)


def write_config(tmp_path, cfg):
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    return str(tmp_path)


class TestPresets:
    @pytest.mark.parametrize(
        "model_id,hidden,layers",
        [
            ("apple/FastVLM-0.5B", 896, 24),
            ("fastvlm-1.5b", 1536, 28),
            ("apple/FastVLM-7B", 3584, 28),
            ("fastvlm-tiny", 64, 2),
        ],
    )
    def test_known_presets(self, model_id, hidden, layers):
        cfg, raw = resolve_fastvlm_config(model_id)
        assert raw is None
        assert cfg.text.hidden_size == hidden
        assert cfg.text.num_hidden_layers == layers

    def test_7b_untied(self):
        cfg, _ = resolve_fastvlm_config("fastvlm-7b")
        assert not cfg.text.tie_word_embeddings

    def test_unknown_id_raises(self):
        with pytest.raises(ValueError, match="Unknown model_id"):
            resolve_fastvlm_config("not-a-model")


class TestLocalCheckpoints:
    def test_llava_qwen2_fields_and_tower_size(self, tmp_path):
        path = write_config(
            tmp_path,
            {
                "model_type": "llava_qwen2",
                "hidden_size": 64,
                "num_hidden_layers": 2,
                "num_attention_heads": 4,
                "num_key_value_heads": 2,
                "intermediate_size": 128,
                "vocab_size": 512,
                "mm_vision_tower": "mobileclip_l_768",
            },
        )
        cfg, raw = resolve_fastvlm_config(path, bootstrap_model_id="fastvlm-tiny")
        assert raw["model_type"] == "llava_qwen2"
        assert cfg.text.hidden_size == 64
        assert cfg.image_size == 768

    def test_bootstrap_borrow_defaults(self, tmp_path):
        # Local config missing most fields: borrow from the bootstrap preset
        # (reference bootstrap semantics, fastvlm_adapter.py:208-241).
        path = write_config(tmp_path, {"model_type": "llava_qwen2"})
        cfg, _ = resolve_fastvlm_config(path, bootstrap_model_id="fastvlm-1.5b")
        assert cfg.text.hidden_size == 1536
        assert cfg.text.num_hidden_layers == 28

    def test_wrong_model_type_raises(self, tmp_path):
        path = write_config(tmp_path, {"model_type": "llama"})
        with pytest.raises(RuntimeError, match="not\\s+llava_qwen2"):
            resolve_fastvlm_config(path)

    def test_missing_config_json_raises(self, tmp_path):
        with pytest.raises(RuntimeError, match="config.json"):
            resolve_fastvlm_config(str(tmp_path))

    def test_text_only_qwen2(self, tmp_path):
        path = write_config(
            tmp_path,
            {"model_type": "qwen2", "hidden_size": 64, "num_hidden_layers": 2,
             "num_attention_heads": 4, "num_key_value_heads": 2,
             "intermediate_size": 128, "vocab_size": 512},
        )
        cfg, _ = resolve_fastvlm_config(path, bootstrap_model_id="fastvlm-tiny")
        assert cfg.image_token_mode == "none"
        assert cfg.num_image_tokens == 0


class TestWeightLoading:
    def test_no_safetensors_returns_none(self, tmp_path):
        cfg, _ = resolve_fastvlm_config("fastvlm-tiny")
        assert load_fastvlm_params(tmp_path, cfg) is None

    def test_decoder_and_projector_conversion(self, tmp_path):
        """A synthetic llava_qwen2 safetensors shard converts to our layout
        and reproduces HF-matching numerics via the adapter."""
        from safetensors.numpy import save_file

        from vla_fastvlm_tpu.models.qwen2 import qwen2_tiny

        cfg, _ = resolve_fastvlm_config("fastvlm-tiny")
        tc = qwen2_tiny()
        rng = np.random.default_rng(0)
        sd = {
            "model.embed_tokens.weight": rng.standard_normal(
                (tc.vocab_size, tc.hidden_size)).astype(np.float32),
            "model.norm.weight": np.ones(tc.hidden_size, np.float32),
            "model.mm_projector.0.weight": rng.standard_normal(
                (tc.hidden_size, 96)).astype(np.float32),
            "model.mm_projector.0.bias": np.zeros(tc.hidden_size, np.float32),
            "model.mm_projector.2.weight": rng.standard_normal(
                (tc.hidden_size, tc.hidden_size)).astype(np.float32),
            "model.mm_projector.2.bias": np.zeros(tc.hidden_size, np.float32),
        }
        d = tc.resolved_head_dim
        for i in range(tc.num_hidden_layers):
            p = f"model.layers.{i}."
            sd[p + "input_layernorm.weight"] = np.ones(tc.hidden_size, np.float32)
            sd[p + "post_attention_layernorm.weight"] = np.ones(tc.hidden_size, np.float32)
            sd[p + "self_attn.q_proj.weight"] = rng.standard_normal(
                (tc.num_attention_heads * d, tc.hidden_size)).astype(np.float32)
            sd[p + "self_attn.q_proj.bias"] = np.zeros(tc.num_attention_heads * d, np.float32)
            sd[p + "self_attn.k_proj.weight"] = rng.standard_normal(
                (tc.num_key_value_heads * d, tc.hidden_size)).astype(np.float32)
            sd[p + "self_attn.k_proj.bias"] = np.zeros(tc.num_key_value_heads * d, np.float32)
            sd[p + "self_attn.v_proj.weight"] = rng.standard_normal(
                (tc.num_key_value_heads * d, tc.hidden_size)).astype(np.float32)
            sd[p + "self_attn.v_proj.bias"] = np.zeros(tc.num_key_value_heads * d, np.float32)
            sd[p + "self_attn.o_proj.weight"] = rng.standard_normal(
                (tc.hidden_size, tc.num_attention_heads * d)).astype(np.float32)
            sd[p + "mlp.gate_proj.weight"] = rng.standard_normal(
                (tc.intermediate_size, tc.hidden_size)).astype(np.float32)
            sd[p + "mlp.up_proj.weight"] = rng.standard_normal(
                (tc.intermediate_size, tc.hidden_size)).astype(np.float32)
            sd[p + "mlp.down_proj.weight"] = rng.standard_normal(
                (tc.hidden_size, tc.intermediate_size)).astype(np.float32)
        save_file(sd, str(tmp_path / "model.safetensors"))

        params = load_fastvlm_params(tmp_path, cfg)
        assert params is not None
        assert "language_model" in params
        # scan-stacked layout: (L, in, out)
        qk = params["language_model"]["layers"]["self_attn"]["q_proj"]["kernel"]
        assert qk.shape == (tc.num_hidden_layers, tc.hidden_size,
                            tc.num_attention_heads * d)
        np.testing.assert_allclose(
            qk[0], sd["model.layers.0.self_attn.q_proj.weight"].T
        )
        assert params["mm_projector"]["fc1"]["kernel"].shape == (96, tc.hidden_size)
