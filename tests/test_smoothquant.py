"""SmoothQuant-style activation smoothing for w8a8 (io/smooth.py).

No reference counterpart (the reference has no quantized path); these pin
the transform's core contracts: per-layer smoothing is float-identical on
every model output, calibration finds the real activation channels, and —
the point of the feature — w8a8 quantization error DROPS on a model with
genuine per-channel activation outliers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.io.quantize import quantize_params
from vla_fastvlm_tpu.io.smooth import collect_norm_absmax, smooth_params_w8a8
from vla_fastvlm_tpu.models.qwen2 import Qwen2ForCausalLM, qwen2_tiny
from vla_fastvlm_tpu.ops import quant as quant_ops


def _tiny_lm(tie=True, outlier_scale=None, seed=0):
    cfg = qwen2_tiny(
        dtype=jnp.float32, param_dtype=jnp.float32, tie_word_embeddings=tie
    )
    model = Qwen2ForCausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(seed).integers(1, 512, (4, 12)))
    params = model.init(jax.random.PRNGKey(seed), input_ids=ids)["params"]
    if outlier_scale:
        # Genuine per-channel residual-stream outliers: scale a few embedding
        # columns, which propagates through RMSNorm as hot channels at every
        # smoothing site (the SmoothQuant failure mode for per-token absmax).
        emb = np.array(params["model"]["embed_tokens"]["embedding"])
        emb[:, ::16] *= outlier_scale
        params = jax.tree_util.tree_map(lambda x: x, params)
        params["model"]["embed_tokens"]["embedding"] = jnp.asarray(emb)
    mask = jnp.ones(ids.shape, jnp.int32)
    return model, params, ids, mask


def _logits(model, params, ids, mask):
    out, _, _ = model.apply(
        {"params": params}, input_ids=ids, attention_mask=mask
    )
    return np.asarray(out, np.float32)


@pytest.fixture
def no_w8a8_gate():
    """Engage the int8 x int8 dot at test shapes (production gates by tokens)."""
    orig = quant_ops.W8A8_MIN_TOKENS
    quant_ops.W8A8_MIN_TOKENS = 0
    yield
    quant_ops.W8A8_MIN_TOKENS = orig


class TestCalibration:
    def test_shapes_and_positivity(self):
        model, params, ids, mask = _tiny_lm()
        calib = collect_norm_absmax(
            model, params, input_ids=ids, attention_mask=mask
        )
        L, H = model.cfg.num_hidden_layers, model.cfg.hidden_size
        assert calib["attn"].shape == (L, H)
        assert calib["mlp"].shape == (L, H)
        assert calib["final"].shape == (H,)
        assert (calib["attn"] > 0).all() and (calib["final"] > 0).all()

    def test_finds_injected_outlier_channels(self):
        model, params, ids, mask = _tiny_lm(outlier_scale=40.0)
        calib = collect_norm_absmax(
            model, params, input_ids=ids, attention_mask=mask
        )
        # Layer-0 attention site sees the normed embeddings directly: the
        # scaled columns must dominate the calibrated absmax.
        a0 = calib["attn"][0]
        hot, cold = a0[::16], np.delete(a0, slice(None, None, 16))
        assert hot.min() > 3 * cold.mean()


class TestFloatIdentity:
    def test_per_layer_smoothing_preserves_all_outputs(self):
        model, params, ids, mask = _tiny_lm(outlier_scale=20.0)
        calib = collect_norm_absmax(
            model, params, input_ids=ids, attention_mask=mask
        )
        smoothed = smooth_params_w8a8(params, calib, alpha=0.5)
        ref, ref_h, _ = model.apply(
            {"params": params}, input_ids=ids, attention_mask=mask
        )
        got, got_h, _ = model.apply(
            {"params": smoothed}, input_ids=ids, attention_mask=mask
        )
        np.testing.assert_allclose(
            np.asarray(got_h), np.asarray(ref_h), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
        )

    def test_norm_weights_actually_changed(self):
        model, params, ids, mask = _tiny_lm(outlier_scale=20.0)
        calib = collect_norm_absmax(
            model, params, input_ids=ids, attention_mask=mask
        )
        smoothed = smooth_params_w8a8(params, calib)
        before = np.asarray(
            params["model"]["layers"]["input_layernorm"]["weight"]
        )
        after = np.asarray(
            smoothed["model"]["layers"]["input_layernorm"]["weight"]
        )
        assert not np.allclose(before, after)

    def test_lm_head_site_logits_invariant_hidden_not(self):
        model, params, ids, mask = _tiny_lm(tie=False, outlier_scale=20.0)
        calib = collect_norm_absmax(
            model, params, input_ids=ids, attention_mask=mask
        )
        smoothed = smooth_params_w8a8(params, calib, include_lm_head=True)
        ref, ref_h, _ = model.apply(
            {"params": params}, input_ids=ids, attention_mask=mask
        )
        got, got_h, _ = model.apply(
            {"params": smoothed}, input_ids=ids, attention_mask=mask
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
        )
        assert not np.allclose(np.asarray(got_h), np.asarray(ref_h), rtol=1e-3)

    def test_lm_head_site_rejected_for_tied_embeddings(self):
        model, params, ids, mask = _tiny_lm(tie=True)
        calib = collect_norm_absmax(
            model, params, input_ids=ids, attention_mask=mask
        )
        with pytest.raises(ValueError, match="tied"):
            smooth_params_w8a8(params, calib, include_lm_head=True)


class TestW8A8QualityGain:
    def test_outlier_model_error_drops(self, no_w8a8_gate):
        model, params, ids, mask = _tiny_lm(outlier_scale=40.0)
        qmodel = Qwen2ForCausalLM(model.cfg.replace(quantization="w8a8"))
        float_logits = _logits(model, params, ids, mask)

        raw = _logits(qmodel, quantize_params(params, mode="w8a8"), ids, mask)
        calib = collect_norm_absmax(
            model, params, input_ids=ids, attention_mask=mask
        )
        smoothed = _logits(
            qmodel,
            quantize_params(
                smooth_params_w8a8(params, calib, alpha=0.5), mode="w8a8"
            ),
            ids,
            mask,
        )
        raw_err = np.linalg.norm(raw - float_logits)
        smooth_err = np.linalg.norm(smoothed - float_logits)
        # The whole point: migrating the outliers into the weights must cut
        # the activation-quantization error decisively, not marginally.
        assert smooth_err < 0.7 * raw_err, (raw_err, smooth_err)

    def test_numpy_tree_path(self, no_w8a8_gate):
        # 7B trees smooth host-side (numpy leaves, like ops/quant.py): same
        # math, no device staging, dtypes preserved.
        model, params, ids, mask = _tiny_lm(outlier_scale=10.0)
        calib = collect_norm_absmax(
            model, params, input_ids=ids, attention_mask=mask
        )
        host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
        s_host = smooth_params_w8a8(host, calib)
        s_dev = smooth_params_w8a8(params, calib)
        k_host = s_host["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
        k_dev = np.asarray(
            s_dev["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
        )
        assert isinstance(k_host, np.ndarray)
        np.testing.assert_allclose(k_host, k_dev, rtol=1e-6)


class TestFastVLMTree:
    def test_policy_tree_smoothing_is_feature_identical(self):
        from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny

        cfg = fastvlm_tiny()
        cfg = cfg.replace(
            text=cfg.text.replace(dtype=jnp.float32, param_dtype=jnp.float32),
            vision=cfg.vision.replace(
                dtype=jnp.float32, param_dtype=jnp.float32
            ),
        )
        model = FastVLM(cfg)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.random((2, 3, cfg.image_size, cfg.image_size), np.float32)
        )
        ids = jnp.asarray(rng.integers(1, 512, (2, 8)))
        mask = jnp.ones(ids.shape, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), images, ids, mask)["params"]

        calib = collect_norm_absmax(model, params, images, ids, mask)
        smoothed = smooth_params_w8a8(params, calib)
        ref_h, _, _ = model.apply({"params": params}, images, ids, mask)
        got_h, _, _ = model.apply({"params": smoothed}, images, ids, mask)
        np.testing.assert_allclose(
            np.asarray(got_h), np.asarray(ref_h), rtol=2e-4, atol=2e-5
        )
