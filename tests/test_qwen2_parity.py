"""Numerical parity of our Flax Qwen2 vs HF transformers' Qwen2ForCausalLM.

This is the core correctness gate for the rebuilt text tower (SURVEY.md §7.2
step 2): random-init a tiny HF Qwen2 on CPU, convert its state dict with our
loader, and require logit agreement in fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vla_fastvlm_tpu.io.weights import convert_qwen2_state_dict
from vla_fastvlm_tpu.models.qwen2 import (
    Qwen2Config,
    Qwen2ForCausalLM,
    init_kv_cache,
    qwen2_tiny,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _make_hf_tiny(tie=True):
    hf_cfg = transformers.Qwen2Config(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        max_position_embeddings=256,
        rope_theta=1_000_000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=tie,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = transformers.Qwen2ForCausalLM(hf_cfg)
    model.eval()
    return model


@pytest.mark.parametrize("tie", [True, False])
def test_logits_match_hf(tie):
    hf = _make_hf_tiny(tie=tie)
    cfg = qwen2_tiny(tie_word_embeddings=tie)

    params = convert_qwen2_state_dict(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    input_ids = rng.integers(0, 512, size=(2, 9))
    attn = np.ones((2, 9), dtype=np.int64)
    attn[1, 6:] = 0  # right padding on the second row

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attn),
        )
    hf_logits = hf_out.logits.numpy()

    model = Qwen2ForCausalLM(cfg)
    logits, hidden, _ = model.apply(
        {"params": params},
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.asarray(attn),
    )
    logits = np.asarray(logits)

    # Compare only unpadded positions (HF computes padded positions too but
    # they are meaningless; ours masks them identically in attention).
    mask = attn.astype(bool)
    np.testing.assert_allclose(logits[mask], hf_logits[mask], rtol=2e-4, atol=2e-4)


def test_scan_and_loop_layouts_agree():
    cfg_scan = qwen2_tiny(scan_layers=True)
    cfg_loop = qwen2_tiny(scan_layers=False)

    model_scan = Qwen2ForCausalLM(cfg_scan)
    key = jax.random.PRNGKey(0)
    ids = jnp.arange(12).reshape(1, 12) % 512
    params_scan = model_scan.init(key, input_ids=ids)["params"]

    # Unstack scan params into the loop layout.
    params_loop = {"model": {}}
    for name, sub in params_scan["model"].items():
        if name == "layers":
            for i in range(cfg_loop.num_hidden_layers):
                params_loop["model"][f"layers_{i}"] = jax.tree_util.tree_map(
                    lambda x, i=i: x[i], sub
                )
        else:
            params_loop["model"][name] = sub
    if "lm_head" in params_scan:
        params_loop["lm_head"] = params_scan["lm_head"]

    out_scan, _, _ = model_scan.apply({"params": params_scan}, input_ids=ids)
    out_loop, _, _ = Qwen2ForCausalLM(cfg_loop).apply({"params": params_loop}, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop), rtol=1e-5, atol=1e-5)


def test_kv_cache_decode_matches_full_forward():
    cfg = qwen2_tiny()
    model = Qwen2ForCausalLM(cfg)
    key = jax.random.PRNGKey(1)
    T = 10
    ids = jax.random.randint(key, (2, T), 0, 512)
    params = model.init(key, input_ids=ids)["params"]

    full_logits, _, _ = model.apply({"params": params}, input_ids=ids)

    cache = init_kv_cache(cfg, batch_size=2, max_len=16)
    # Prefill the first 6 tokens, then decode one token at a time.
    logits, _, cache = model.apply(
        {"params": params}, input_ids=ids[:, :6], cache=cache
    )
    step_logits = [logits]
    for t in range(6, T):
        logits, _, cache = model.apply(
            {"params": params}, input_ids=ids[:, t : t + 1], cache=cache
        )
        step_logits.append(logits)
    cached_logits = jnp.concatenate(step_logits, axis=1)

    np.testing.assert_allclose(
        np.asarray(cached_logits), np.asarray(full_logits), rtol=1e-4, atol=1e-4
    )
