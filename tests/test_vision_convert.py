"""Vision tower conversion: synthetic Apple-layout dicts -> our fused params.

Generates both storage modes of the ml-fastvlm layout for the tiny config,
converts, and (a) checks structural compatibility with the Flax model
(loadable, forward runs, weights actually used), (b) checks fold correctness
on constructed branch values with known fused equivalents.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vla_fastvlm_tpu.io.vision_convert import DEFAULT_PREFIX, convert_vision_tower
from vla_fastvlm_tpu.models.fastvit import FastViTHD, fastvithd_tiny


def identity_bn(c):
    """BN that folds to identity: gamma=1, beta=0, mean=0, var=1-eps."""
    return {
        "weight": np.ones(c, np.float32),
        "bias": np.zeros(c, np.float32),
        "running_mean": np.zeros(c, np.float32),
        "running_var": np.full(c, 1.0 - 1e-5, np.float32),
    }


def put_bn(sd, base, bn):
    for k, v in bn.items():
        sd[f"{base}.{k}"] = v


def make_inference_mode_dict(cfg, rng):
    """Fused (reparam_conv / lkb_reparam) Apple-style names for tiny cfg."""
    sd = {}
    p = DEFAULT_PREFIX
    d0 = cfg.embed_dims[0]

    def conv(name, o, i, k):
        sd[p + name + ".weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.1
        sd[p + name + ".bias"] = rng.standard_normal(o).astype(np.float32) * 0.1

    # stem
    conv("patch_embed.0.reparam_conv", d0, 3, 3)
    conv("patch_embed.1.reparam_conv", d0, 1, 3)  # depthwise
    conv("patch_embed.2.reparam_conv", d0, d0, 1)

    net = 0
    for stage, (dim, depth, mixer, ratio, cpe) in enumerate(
        zip(cfg.embed_dims, cfg.depths, cfg.token_mixers, cfg.mlp_ratios, cfg.pos_embs)
    ):
        prev = cfg.embed_dims[stage - 1] if stage > 0 else d0
        if stage > 0:
            base = f"network.{net}"
            import math

            g = math.gcd(prev, dim)
            conv(f"{base}.proj.0.lkb_reparam", dim, prev // g, 7)
            conv(f"{base}.proj.1.reparam_conv", dim, dim, 1)
            net += 1
        if cpe:
            conv(f"network.{net}.reparam_conv", dim, 1, 7)
            net += 1
        for blk in range(depth):
            base = f"network.{net}.{blk}"
            hidden = int(dim * ratio)
            if mixer == "repmixer":
                conv(f"{base}.token_mixer.reparam_conv", dim, 1, 3)
            else:
                put_bn(sd, p + f"{base}.norm", identity_bn(dim))
                sd[p + f"{base}.token_mixer.qkv.weight"] = (
                    rng.standard_normal((3 * dim, dim)).astype(np.float32) * 0.1
                )
                sd[p + f"{base}.token_mixer.proj.weight"] = (
                    rng.standard_normal((dim, dim)).astype(np.float32) * 0.1
                )
                sd[p + f"{base}.token_mixer.proj.bias"] = np.zeros(dim, np.float32)
                sd[p + f"{base}.layer_scale_1"] = np.full((dim, 1, 1), 1e-2, np.float32)
                sd[p + f"{base}.layer_scale_2"] = np.full((dim, 1, 1), 1e-2, np.float32)
            # convffn (both block kinds)
            sd[p + f"{base}.convffn.conv.conv.weight"] = (
                rng.standard_normal((dim, 1, 7, 7)).astype(np.float32) * 0.1
            )
            put_bn(sd, p + f"{base}.convffn.conv.bn", identity_bn(dim))
            conv(f"{base}.convffn.fc1", hidden, dim, 1)
            conv(f"{base}.convffn.fc2", dim, hidden, 1)
            if mixer == "repmixer":
                sd[p + f"{base}.layer_scale"] = np.full((dim, 1, 1), 1e-2, np.float32)
        net += 1

    conv("conv_exp.reparam_conv", cfg.out_channels, 1, 3)  # depthwise-expand
    return sd


class TestInferenceModeConversion:
    def test_structural_load_and_forward(self):
        cfg = fastvithd_tiny()
        rng = np.random.default_rng(0)
        sd = make_inference_mode_dict(cfg, rng)
        converted = convert_vision_tower(sd, cfg)

        model = FastViTHD(cfg)
        x = jnp.asarray(rng.random((1, 3, 64, 64), dtype=np.float32))
        init = model.init(jax.random.PRNGKey(0), x)["params"]

        # structural equality: identical tree paths and shapes
        flat_init = jax.tree_util.tree_leaves_with_path(init)
        flat_conv = jax.tree_util.tree_leaves_with_path(converted)
        paths_init = {jax.tree_util.keystr(p): l.shape for p, l in flat_init}
        paths_conv = {jax.tree_util.keystr(p): l.shape for p, l in flat_conv}
        assert paths_init == paths_conv

        out_converted = model.apply({"params": converted}, x)
        out_init = model.apply({"params": init}, x)
        assert out_converted.shape == out_init.shape
        assert not np.allclose(np.asarray(out_converted), np.asarray(out_init))

    def test_fused_weights_copied_verbatim(self):
        cfg = fastvithd_tiny()
        rng = np.random.default_rng(1)
        sd = make_inference_mode_dict(cfg, rng)
        converted = convert_vision_tower(sd, cfg)
        w = sd[DEFAULT_PREFIX + "patch_embed.0.reparam_conv.weight"]
        np.testing.assert_allclose(
            converted["stem_0"]["conv"]["kernel"],
            np.transpose(w, (2, 3, 1, 0)),
        )


class TestAdapterIntegration:
    def test_backbone_loads_local_checkpoint_with_vision(self, tmp_path):
        """Full path: config.json + safetensors (decoder + projector + vision
        in Apple layout) -> FastVLMBackbone with converted, non-random
        weights."""
        import json

        from safetensors.numpy import save_file

        from vla_fastvlm_tpu.model.fastvlm_adapter import (
            FastVLMBackbone,
            FastVLMBackboneConfig,
        )
        from vla_fastvlm_tpu.models.qwen2 import qwen2_tiny

        cfg = fastvithd_tiny()
        tc = qwen2_tiny()
        rng = np.random.default_rng(3)

        sd = make_inference_mode_dict(cfg, rng)
        # decoder + projector (HF layout)
        sd["model.embed_tokens.weight"] = rng.standard_normal(
            (tc.vocab_size, tc.hidden_size)).astype(np.float32)
        sd["model.norm.weight"] = np.ones(tc.hidden_size, np.float32)
        sd["model.mm_projector.0.weight"] = rng.standard_normal(
            (tc.hidden_size, cfg.out_channels)).astype(np.float32)
        sd["model.mm_projector.0.bias"] = np.zeros(tc.hidden_size, np.float32)
        sd["model.mm_projector.2.weight"] = rng.standard_normal(
            (tc.hidden_size, tc.hidden_size)).astype(np.float32)
        sd["model.mm_projector.2.bias"] = np.zeros(tc.hidden_size, np.float32)
        d = tc.resolved_head_dim
        for i in range(tc.num_hidden_layers):
            p = f"model.layers.{i}."
            sd[p + "input_layernorm.weight"] = np.ones(tc.hidden_size, np.float32)
            sd[p + "post_attention_layernorm.weight"] = np.ones(
                tc.hidden_size, np.float32)
            sd[p + "self_attn.q_proj.weight"] = rng.standard_normal(
                (tc.num_attention_heads * d, tc.hidden_size)).astype(np.float32)
            sd[p + "self_attn.q_proj.bias"] = np.zeros(
                tc.num_attention_heads * d, np.float32)
            sd[p + "self_attn.k_proj.weight"] = rng.standard_normal(
                (tc.num_key_value_heads * d, tc.hidden_size)).astype(np.float32)
            sd[p + "self_attn.k_proj.bias"] = np.zeros(
                tc.num_key_value_heads * d, np.float32)
            sd[p + "self_attn.v_proj.weight"] = rng.standard_normal(
                (tc.num_key_value_heads * d, tc.hidden_size)).astype(np.float32)
            sd[p + "self_attn.v_proj.bias"] = np.zeros(
                tc.num_key_value_heads * d, np.float32)
            sd[p + "self_attn.o_proj.weight"] = rng.standard_normal(
                (tc.hidden_size, tc.num_attention_heads * d)).astype(np.float32)
            sd[p + "mlp.gate_proj.weight"] = rng.standard_normal(
                (tc.intermediate_size, tc.hidden_size)).astype(np.float32)
            sd[p + "mlp.up_proj.weight"] = rng.standard_normal(
                (tc.intermediate_size, tc.hidden_size)).astype(np.float32)
            sd[p + "mlp.down_proj.weight"] = rng.standard_normal(
                (tc.hidden_size, tc.intermediate_size)).astype(np.float32)

        (tmp_path / "config.json").write_text(json.dumps({
            "model_type": "llava_qwen2",
            "hidden_size": tc.hidden_size,
            "num_hidden_layers": tc.num_hidden_layers,
            "num_attention_heads": tc.num_attention_heads,
            "num_key_value_heads": tc.num_key_value_heads,
            "intermediate_size": tc.intermediate_size,
            "vocab_size": tc.vocab_size,
            "mm_vision_tower": "fastvithd_64",
        }))
        save_file(sd, str(tmp_path / "model.safetensors"))

        backbone = FastVLMBackbone(FastVLMBackboneConfig(
            model_id=str(tmp_path),
            bootstrap_model_id="fastvlm-tiny",
            tokenizer_max_length=16,
        ))
        assert backbone.expected_size == 64
        # converted decoder weights landed (not random): exact match
        qk = backbone.params["language_model"]["layers"]["self_attn"]["q_proj"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(qk[0]), sd["model.layers.0.self_attn.q_proj.weight"].T,
            rtol=1e-6,
        )
        # vision weights landed
        np.testing.assert_allclose(
            np.asarray(backbone.params["vision_tower"]["stem_0"]["conv"]["bias"]),
            sd["model.vision_tower.vision_tower.model.patch_embed.0.reparam_conv.bias"],
            rtol=1e-6,
        )
        # and the whole thing runs
        feats = backbone.forward(
            np.zeros((1, 3, 64, 64), np.float32), ["pick\n"]
        )
        assert np.isfinite(np.asarray(feats, np.float32)).all()


class TestTrainModeFold:
    def test_stem_block_branch_fold(self):
        """Train-mode MobileOne stem block folds to conv+1x1+identity sum."""
        cfg = fastvithd_tiny()
        rng = np.random.default_rng(2)
        sd = make_inference_mode_dict(cfg, rng)
        # Replace stem_0's fused entry with equivalent train-mode branches:
        # conv3x3 branch with identity BN + zeroed scale/skip == plain conv.
        d0 = cfg.embed_dims[0]
        w = sd.pop(DEFAULT_PREFIX + "patch_embed.0.reparam_conv.weight")
        b = sd.pop(DEFAULT_PREFIX + "patch_embed.0.reparam_conv.bias")
        base = DEFAULT_PREFIX + "patch_embed.0"
        sd[base + ".rbr_conv.0.conv.weight"] = w
        bn = identity_bn(d0)
        bn["bias"] = b  # beta folds straight into the bias
        put_bn(sd, base + ".rbr_conv.0.bn", bn)

        converted = convert_vision_tower(sd, cfg)
        np.testing.assert_allclose(
            converted["stem_0"]["conv"]["kernel"],
            np.transpose(w, (2, 3, 1, 0)),
            rtol=1e-5,
        )
        np.testing.assert_allclose(converted["stem_0"]["conv"]["bias"], b, rtol=1e-5)

    def test_unmatched_names_raise(self):
        cfg = fastvithd_tiny()
        with pytest.raises(KeyError):
            convert_vision_tower({"model.vision_tower.bogus": np.zeros(1)}, cfg)
        with pytest.raises(KeyError, match="prefix"):
            convert_vision_tower({"unrelated": np.zeros(1)}, cfg)
