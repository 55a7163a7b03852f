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
