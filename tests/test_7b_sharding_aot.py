"""AOT compile-check of the 7B TP path on the virtual 8-device mesh.

Qwen2-7B cannot be materialized here (no weights, little RAM), but
``jit(...).lower(abstract).compile()`` validates the full TP/DP sharding
layout — partition specs consistent with 7B shapes, collectives inserted,
program compiles — without allocating a single parameter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from vla_fastvlm_tpu.models import Qwen2Model, qwen2_7b
from vla_fastvlm_tpu.parallel import (
    batch_spec,
    make_mesh,
    param_shardings,
    spec_for_param,
)


@pytest.mark.slow
def test_7b_decoder_tp_compiles_on_mesh():
    mesh = make_mesh(data=2, model=4)
    cfg = qwen2_7b(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    model = Qwen2Model(cfg)

    b, t = 8, 64
    ids = jax.ShapeDtypeStruct((b, t), jnp.int32)
    mask = jax.ShapeDtypeStruct((b, t), jnp.int32)

    # abstract params via eval_shape: no memory allocated
    params_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32))
    )["params"]

    shardings = param_shardings(mesh, params_shape)
    # sanity: 7B qkv kernel is sharded over model axis and divisible
    qk = params_shape["layers"]["self_attn"]["q_proj"]["kernel"]
    assert qk.shape == (28, 3584, 3584)
    assert spec_for_param(("layers", "self_attn", "q_proj", "kernel"), 3)[-1] == "model"
    assert qk.shape[-1] % 4 == 0  # divisible by model axis

    def forward(params, ids, mask):
        hidden, _, _ = model.apply(
            {"params": params}, input_ids=ids, attention_mask=mask
        )
        return hidden

    abstract_params = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        params_shape,
        shardings,
    )
    data_sharding = NamedSharding(mesh, batch_spec())
    ids = jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=data_sharding)
    mask = jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=data_sharding)

    with mesh:
        lowered = jax.jit(forward).lower(abstract_params, ids, mask)
        compiled = lowered.compile()

    # The compiled program must contain cross-device collectives (TP all-
    # reduce after row-parallel projections).
    hlo = compiled.as_text()
    assert "all-reduce" in hlo or "all-gather" in hlo or "reduce-scatter" in hlo

    # Per-device parameter bytes must fit a v5e chip (16 GB):
    total = sum(
        np.prod(s.shape) * 2 for s in jax.tree_util.tree_leaves(params_shape)
    )
    per_device_model_shard = total / 4  # model axis 4
    assert per_device_model_shard < 8e9, per_device_model_shard


@pytest.mark.slow
def test_7b_serving_prefill_decode_tp_compiles_on_mesh():
    """The BASELINE.json north-star path: FastVLM-7B *inference* sharded over
    a v5e-8-shaped mesh — multimodal prefill into a model-sharded KV cache
    plus one decode step — AOT-compiles with TP collectives (VERDICT r1 #2)."""
    from vla_fastvlm_tpu.models import FastVLM
    from vla_fastvlm_tpu.models.fastvit import fastvithd
    from vla_fastvlm_tpu.models.fastvlm import FastVLMConfig
    from vla_fastvlm_tpu.models.qwen2 import qwen2_7b
    from vla_fastvlm_tpu.parallel import cache_shardings

    mesh = make_mesh(data=2, model=4)
    cfg = FastVLMConfig(
        vision=fastvithd(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16),
        text=qwen2_7b(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16),
        image_size=256,
    )
    model = FastVLM(cfg)

    from vla_fastvlm_tpu.serving import build_cache

    b, t, new = 8, 64, 4
    # init through prefill: 7B is untied, lm_head only exists on that path
    params_shape = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, 256, 256), jnp.bfloat16),
            jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), jnp.int32),
            build_cache(cfg, 1, 4, 1),
            method=FastVLM.prefill,
        )
    )["params"]
    abstract_params = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        params_shape,
        param_shardings(mesh, params_shape),
    )

    cache_shape = jax.eval_shape(lambda: build_cache(cfg, b, t, new))
    cache_sh = cache_shardings(mesh, cache_shape)
    # kv heads (4) divide the model axis (4): decode cache stays chip-local
    assert cache_shape["k"].shape[3] == 4
    abstract_cache = {
        key: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=cache_sh[key])
        for key, s in cache_shape.items()
    }

    data_sharding = NamedSharding(mesh, batch_spec())
    imgs = jax.ShapeDtypeStruct((b, 3, 256, 256), jnp.bfloat16, sharding=data_sharding)
    ids = jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=data_sharding)
    mask = jax.ShapeDtypeStruct((b, t), jnp.int32, sharding=data_sharding)
    tok = jax.ShapeDtypeStruct((b, 1), jnp.int32, sharding=data_sharding)

    def prefill(params, imgs, ids, mask, cache):
        last, _, cache, _, _ = model.apply(
            {"params": params}, imgs, ids, mask, cache, method=FastVLM.prefill
        )
        return last, cache

    def decode(params, tok, cache):
        logits, cache = model.apply(
            {"params": params}, tok, cache, method=FastVLM.decode_step
        )
        return logits, cache

    with mesh:
        compiled_prefill = (
            jax.jit(prefill)
            .lower(abstract_params, imgs, ids, mask, abstract_cache)
            .compile()
        )
        compiled_decode = (
            jax.jit(decode).lower(abstract_params, tok, abstract_cache).compile()
        )

    for compiled in (compiled_prefill, compiled_decode):
        hlo = compiled.as_text()
        assert (
            "all-reduce" in hlo or "all-gather" in hlo or "reduce-scatter" in hlo
        )

    # Serving memory budget on one v5e chip (16 GB): param shard + cache shard
    param_bytes = sum(
        np.prod(s.shape) * 2 for s in jax.tree_util.tree_leaves(params_shape)
    )
    cache_bytes = sum(
        np.prod(s.shape) * s.dtype.itemsize
        for s in jax.tree_util.tree_leaves(cache_shape)
    )
    per_chip = param_bytes / 4 + cache_bytes / 8  # model=4, data*model=8
    assert per_chip < 8e9, per_chip


@pytest.mark.slow
def test_7b_full_policy_int8_aot_single_chip_and_mesh():
    """The north-star program (VERDICT r2 #1): the FULL FastVLM-7B policy
    step — 1024px FastViTHD + projector + int8 Qwen2-7B prefill + last-text
    pooling + action head — AOT-compiles (a) single-device at the measured
    bench configuration and (b) DP=2 x TP=4 on the virtual v5e-8 mesh with
    TP collectives. This is the same compute composition ``bench.py
    --model-id fastvlm-7b --quantization int8 --fabricate`` measures live
    on the chip (``FastVLMWithExpert.apply_fn``: features_fn + head)."""
    from vla_fastvlm_tpu.io.quantize import quantize_params
    from vla_fastvlm_tpu.models import FastVLM
    from vla_fastvlm_tpu.models.action_head import ActionExpertHead
    from vla_fastvlm_tpu.models.fastvit import fastvithd
    from vla_fastvlm_tpu.models.fastvlm import (
        FastVLMConfig,
        pool_last_text_token,
    )
    from vla_fastvlm_tpu.models.qwen2 import qwen2_7b

    cfg = FastVLMConfig(
        vision=fastvithd(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16),
        text=qwen2_7b(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                      quantization="int8"),
        image_size=1024,
    )
    model = FastVLM(cfg)
    head = ActionExpertHead(
        state_dim=14, action_dim=14, dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16, dropout=0.0,
    )

    float_shapes = jax.eval_shape(
        lambda: FastVLM(cfg.replace(
            text=cfg.text.replace(quantization="none"))).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, 1024, 1024), jnp.bfloat16),
            jnp.zeros((1, 4), jnp.int32),
        )["params"]
    )
    qshapes = jax.eval_shape(quantize_params, float_shapes)
    head_shapes = jax.eval_shape(
        lambda: head.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 3584), jnp.bfloat16),
            jnp.zeros((1, 14), jnp.bfloat16),
        )["params"]
    )
    # Single-chip memory: int8 decoder + bf16 embedding/vision/head < 16 GB.
    total_bytes = sum(
        np.prod(s.shape) * s.dtype.itemsize
        for s in jax.tree_util.tree_leaves((qshapes, head_shapes))
    )
    assert total_bytes < 10e9, f"{total_bytes / 1e9:.1f} GB"

    def policy_step(params, images, ids, mask, states):
        hidden, _, text_mask = model.apply(
            {"params": params["backbone"]}, images, ids, mask
        )
        pooled = jax.lax.stop_gradient(pool_last_text_token(hidden, text_mask))
        return head.apply({"params": params["head"]}, pooled, states)

    b, t = 2, 64
    args_1chip = (
        {"backbone": qshapes, "head": head_shapes},
        jax.ShapeDtypeStruct((b, 3, 1024, 1024), jnp.bfloat16),
        jax.ShapeDtypeStruct((b, t), jnp.int32),
        jax.ShapeDtypeStruct((b, t), jnp.int32),
        jax.ShapeDtypeStruct((b, 14), jnp.bfloat16),
    )
    compiled = jax.jit(policy_step).lower(*args_1chip).compile()
    assert compiled is not None  # compilation itself is the check

    # DP=2 x TP=4 on the virtual v5e-8 mesh: int8 kernels AND their scales
    # shard over `model`; batch over `data`; collectives present.
    mesh = make_mesh(data=2, model=4)
    q_sh = param_shardings(mesh, qshapes)
    assert (
        spec_for_param(("layers", "self_attn", "q_proj", "scale"), 3)[-1]
        == "model"
    )
    abstract_params = {
        "backbone": jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            qshapes, q_sh,
        ),
        "head": jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, s.dtype,
                sharding=NamedSharding(mesh, jax.sharding.PartitionSpec()),
            ),
            head_shapes,
        ),
    }
    data_sharding = NamedSharding(mesh, batch_spec())
    b8 = 8
    abstract_args = (
        abstract_params,
        jax.ShapeDtypeStruct((b8, 3, 1024, 1024), jnp.bfloat16, sharding=data_sharding),
        jax.ShapeDtypeStruct((b8, t), jnp.int32, sharding=data_sharding),
        jax.ShapeDtypeStruct((b8, t), jnp.int32, sharding=data_sharding),
        jax.ShapeDtypeStruct((b8, 14), jnp.bfloat16, sharding=data_sharding),
    )
    with mesh:
        compiled_mesh = jax.jit(policy_step).lower(*abstract_args).compile()
    hlo = compiled_mesh.as_text()
    assert "all-reduce" in hlo or "all-gather" in hlo or "reduce-scatter" in hlo
    # Per-chip: model-sharded int8 params / 4 + replicated vision/embed.
    assert total_bytes / 4 < 4e9


@pytest.mark.slow
def test_7b_int4_decode_tp_compiles_on_mesh():
    """Weight-only int4 under TP: packed-s4 7B decoder kernels and their
    per-group-of-128 scales shard over the ``model`` axis (group scales on
    row-split kernels follow the contraction split) and one decode step
    AOT-compiles DP=2 x TP=4 with collectives on the virtual v5e-8 mesh —
    the same layouts ``parallel.shard_params`` places at runtime via the
    Format-pinned staging cast (``device.stage_int4``)."""
    from vla_fastvlm_tpu.io.quantize import quantize_params
    from vla_fastvlm_tpu.models.qwen2 import (
        Qwen2ForCausalLM,
        init_kv_cache,
        qwen2_7b,
    )
    from vla_fastvlm_tpu.parallel import cache_shardings

    cfg = qwen2_7b(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                   quantization="int4")
    model = Qwen2ForCausalLM(cfg)

    float_shapes = jax.eval_shape(
        lambda: Qwen2ForCausalLM(cfg.replace(quantization="none")).init(
            jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 4), jnp.int32)
        )["params"]
    )
    qshapes = jax.eval_shape(
        lambda p: quantize_params(p, mode="int4"), float_shapes
    )
    attn = qshapes["model"]["layers"]["self_attn"]
    assert attn["q_proj"]["kernel"].dtype == jnp.int4
    # Per-group scales: (L, K/128, N) — 3584/128 = 28 groups.
    assert attn["o_proj"]["scale"].shape == (28, 28, 3584)

    mesh = make_mesh(data=2, model=4)
    shardings = param_shardings(mesh, qshapes)
    # Row-split o_proj: kernel splits K on model, group scales follow it.
    assert shardings["model"]["layers"]["self_attn"]["o_proj"]["kernel"].spec[-2] == "model"
    assert shardings["model"]["layers"]["self_attn"]["o_proj"]["scale"].spec[-2] == "model"
    # Column-split gate_proj: kernel and scales split N on model.
    mlp_sh = shardings["model"]["layers"]["mlp"]
    assert mlp_sh["gate_proj"]["kernel"].spec[-1] == "model"
    assert mlp_sh["gate_proj"]["scale"].spec[-1] == "model"

    abstract_params = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        qshapes, shardings,
    )
    b, max_len = 16, 80
    cache_shape = jax.eval_shape(lambda: init_kv_cache(cfg, b, max_len))
    cache_sh = cache_shardings(mesh, cache_shape)
    abstract_cache = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        cache_shape, cache_sh,
    )
    data_sharding = NamedSharding(mesh, batch_spec())
    tok = jax.ShapeDtypeStruct((b, 1), jnp.int32, sharding=data_sharding)

    def decode(params, tok, cache):
        logits, _, cache = model.apply(
            {"params": params}, input_ids=tok, cache=cache
        )
        return logits[:, -1], cache

    with mesh:
        compiled = (
            jax.jit(decode).lower(abstract_params, tok, abstract_cache).compile()
        )
    hlo = compiled.as_text()
    assert "all-reduce" in hlo or "all-gather" in hlo or "reduce-scatter" in hlo

    # Per-chip int4 decoder share: packed s4 = nbytes/2 host-side accounting.
    packed = sum(
        (np.prod(s.shape) + 1) // 2 if s.dtype == jnp.int4
        else np.prod(s.shape) * s.dtype.itemsize
        for s in jax.tree_util.tree_leaves(qshapes)
    )
    assert packed / 4 < 2.5e9, packed


@pytest.mark.slow
def test_7b_int8_decode_compiles_single_device():
    """7B weight-only int8 fits and compiles on ONE chip (the single-v5e
    serving shape bf16 cannot reach: ~15.2 GB bf16 vs ~7.5 GB int8+scales).
    AOT with abstract params — the live measurement is
    scripts/bench_7b_serving.py."""
    from vla_fastvlm_tpu.io.quantize import quantize_params
    from vla_fastvlm_tpu.models.qwen2 import (
        Qwen2ForCausalLM,
        init_kv_cache,
        qwen2_7b,
    )

    cfg = qwen2_7b(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                   quantization="int8")
    model = Qwen2ForCausalLM(cfg)

    float_shapes = jax.eval_shape(
        lambda: Qwen2ForCausalLM(cfg.replace(quantization="none")).init(
            jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 4), jnp.int32)
        )["params"]
    )
    qshapes = jax.eval_shape(quantize_params, float_shapes)
    assert qshapes["lm_head"]["kernel"].dtype == jnp.int8
    total_bytes = sum(
        np.prod(s.shape) * s.dtype.itemsize
        for s in jax.tree_util.tree_leaves(qshapes)
    )
    assert total_bytes < 9e9, f"{total_bytes / 1e9:.1f} GB does not fit one v5e"

    b, max_len = 16, 80
    cache_shape = jax.eval_shape(lambda: init_kv_cache(cfg, b, max_len))
    tok = jax.ShapeDtypeStruct((b, 1), jnp.int32)

    def decode(params, tok, cache):
        logits, _, cache = model.apply(
            {"params": params}, input_ids=tok, cache=cache
        )
        return logits[:, -1], cache

    compiled = jax.jit(decode).lower(qshapes, tok, cache_shape).compile()
    # Temp allocations must stay far below a dequantized bf16 weight copy
    # (~13 GB). The CPU test backend materializes the fused int8 gate/up
    # concat (~3.4 GB int8) instead of fusing it into the dot, so the bound
    # is backend-loose; on the real chip the measured 341 GB/s implied
    # weight-streaming rate (BASELINE.md, scripts/bench_7b_serving.py)
    # confirms weights stream int8 without a bf16 copy.
    stats = compiled.memory_analysis()
    if stats is not None:
        assert stats.temp_size_in_bytes < 5e9, stats.temp_size_in_bytes
