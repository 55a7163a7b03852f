"""Model-FLOPs accounting and MFU (model FLOPs utilization).

The reference publishes no efficiency numbers at all (SURVEY.md §6); BASELINE
rows here carry an MFU column so "is it actually fast?" is answerable from
the artifacts. FLOPs come from XLA's own cost model on the *compiled*
program (``Compiled.cost_analysis()``) — no hand-derived formulas to drift
out of sync with the model code.
"""

from __future__ import annotations

from typing import Optional

import jax

# Peak dense-matmul throughput per chip, bf16, FLOP/s. Sources: public TPU
# spec sheets (v5e 197 TF/s bf16; v5p 459; v4 275; v3 123; v6e/Trillium 918).
_PEAK_BF16 = {
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v3": 123e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
}


def device_peak_flops(device: Optional[jax.Device] = None) -> Optional[float]:
    """Peak bf16 FLOP/s for ``device``, or None when unknown (e.g. CPU)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak
    return None


def compiled_flops(compiled) -> Optional[float]:
    """Total FLOPs of a ``jax.jit(...).lower(...).compile()`` program.

    Returns None when the backend exposes no cost analysis.
    """
    try:
        analysis = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0] if analysis else None
    if not analysis:
        return None
    flops = analysis.get("flops")
    return float(flops) if flops and flops > 0 else None


def fastvlm_serve_flops(
    model,
    batch: int,
    prompt_len: int,
) -> Optional[float]:
    """Exact model FLOPs of one policy serving step, XLA-counted.

    ``compiled_flops`` on the *production* program undercounts the decoder:
    both the CPU and TPU cost models count a ``lax.scan``/While body ONCE,
    not trip-count times (verified on both backends — a scan of 28 matmuls
    reports 1x the matmul FLOPs). The production Qwen2 stack scans its
    layers (``Qwen2Config.scan_layers``), so serve-step MFU computed from
    the compiled program is ~L-times low on the decoder share.

    This builds an abstract *counting twin* of the policy step — same
    modules, same shapes, ``scan_layers=False`` so every layer appears in
    the HLO — AOT-compiles it on the (always-present) CPU backend with
    abstract params, and reads XLA's cost model. No weights, no execution,
    no device traffic; the count is a function of shapes only.

    ``model``: a ``FastVLMWithExpert`` (its backbone config and head module
    are reused, quantization stripped — model FLOPs are float FLOPs by
    definition). Returns None if the CPU backend or cost analysis is
    unavailable.
    """
    import jax.numpy as jnp

    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        return None
    from ..models.fastvlm import FastVLM, pool_hidden, pool_last_text_token

    mcfg = model.backbone.model_config
    mcfg = mcfg.replace(
        text=mcfg.text.replace(scan_layers=False, quantization="none")
    )
    twin = FastVLM(mcfg)
    head = model.head
    bcfg = model.backbone.config
    state_dim = model.config.state_dim

    def step(params, head_params, images, ids, mask, states):
        hidden, _seq_mask, text_mask = twin.apply(
            {"params": params}, images, ids, mask
        )
        if bcfg.image_feature_pool == "mean_pool":
            feats = pool_hidden(hidden, text_mask, "mean_pool")
        else:
            feats = pool_last_text_token(hidden, text_mask)
        return head.apply(
            {"params": head_params}, feats, states, deterministic=True
        )

    if mcfg.num_cameras > 1:
        img_shape = (batch, mcfg.num_cameras, 3, mcfg.image_size, mcfg.image_size)
    else:
        img_shape = (batch, 3, mcfg.image_size, mcfg.image_size)
    dtype = mcfg.text.dtype
    try:
        with jax.default_device(cpu):
            params_shape = jax.eval_shape(
                lambda: twin.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1,) + img_shape[1:], dtype),
                    jnp.zeros((1, 4), jnp.int32),
                )
            )["params"]
            head_shape = jax.eval_shape(
                lambda: head.init(
                    jax.random.PRNGKey(1),
                    jnp.zeros((1, mcfg.text.hidden_size), dtype),
                    jnp.zeros((1, state_dim), dtype),
                )
            )["params"]
            abstract = lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype)
            compiled = (
                jax.jit(step)
                .lower(
                    jax.tree_util.tree_map(abstract, params_shape),
                    jax.tree_util.tree_map(abstract, head_shape),
                    jax.ShapeDtypeStruct(img_shape, dtype),
                    jax.ShapeDtypeStruct((batch, prompt_len), jnp.int32),
                    jax.ShapeDtypeStruct((batch, prompt_len), jnp.int32),
                    jax.ShapeDtypeStruct((batch, state_dim), dtype),
                )
                .compile()
            )
        return compiled_flops(compiled)
    except Exception:  # pragma: no cover - backend dependent
        return None


def fastvlm_train_flops(
    model,
    batch: int,
    prompt_len: int,
    train_backbone: bool = False,
    lora_rank: int = 0,
) -> Optional[float]:
    """Exact model FLOPs of one bench train step, XLA-counted.

    Counting twin of ``bench.py --mode train``'s ``train_step``: full-policy
    forward + MSE loss + gradients w.r.t. the trainable head (the backbone
    is frozen per reference semantics — ``fastvlm_adapter.py:501`` — so the
    backward pass touches only the head). ``train_backbone=True``
    additionally differentiates the backbone params (the full fine-tuning
    regime). ``lora_rank > 0`` mounts rank-r adapters on the twin's decoder
    projections and differentiates {head, lora} over the frozen base — the
    LoRA/QLoRA step: the backward traverses every frozen base matmul
    (d-loss/d-activation chains through ``y = xW + xAB``) plus the rank-r
    factor grads, and XLA's cost model counts exactly that. The twin stays
    remat-free, so the count is *useful* model FLOPs — the standard MFU
    convention excludes rematerialization recompute (and quantization is
    stripped: model FLOPs are float FLOPs by definition). Same
    scan-unrolled AOT-on-CPU methodology as ``fastvlm_serve_flops`` (the
    cost model counts scan bodies once). The optimizer update (AdamW
    elementwise) is excluded as negligible. Returns None when the CPU
    backend or cost analysis is unavailable.
    """
    import jax.numpy as jnp

    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        return None
    from ..models.fastvlm import FastVLM, pool_hidden, pool_last_text_token

    if lora_rank > 0 and train_backbone:
        raise ValueError("lora_rank > 0 with train_backbone is contradictory")

    mcfg = model.backbone.model_config
    mcfg = mcfg.replace(
        text=mcfg.text.replace(scan_layers=False, quantization="none")
    )
    twin = FastVLM(mcfg)
    head = model.head
    bcfg = model.backbone.config
    state_dim = model.config.state_dim
    action_dim = model.config.action_dim

    def loss(trainable, params, images, ids, mask, states, actions):
        variables = {"params": params}
        if "lora" in trainable:
            variables["lora"] = trainable["lora"]
        hidden, _seq_mask, text_mask = twin.apply(
            variables, images, ids, mask
        )
        if bcfg.image_feature_pool == "mean_pool":
            feats = pool_hidden(hidden, text_mask, "mean_pool")
        else:
            feats = pool_last_text_token(hidden, text_mask)
        preds = head.apply(
            {"params": trainable["head"]}, feats, states, deterministic=True
        )
        return jnp.mean(jnp.square(preds - actions.astype(preds.dtype)))

    argnums = (0, 1) if train_backbone else 0

    def train_step(trainable, params, images, ids, mask, states, actions):
        return jax.value_and_grad(loss, argnums=argnums)(
            trainable, params, images, ids, mask, states, actions
        )

    if mcfg.num_cameras > 1:
        img_shape = (batch, mcfg.num_cameras, 3, mcfg.image_size, mcfg.image_size)
    else:
        img_shape = (batch, 3, mcfg.image_size, mcfg.image_size)
    dtype = mcfg.text.dtype
    try:
        with jax.default_device(cpu):
            params_shape = jax.eval_shape(
                lambda: twin.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1,) + img_shape[1:], dtype),
                    jnp.zeros((1, 4), jnp.int32),
                )
            )["params"]
            head_shape = jax.eval_shape(
                lambda: head.init(
                    jax.random.PRNGKey(1),
                    jnp.zeros((1, mcfg.text.hidden_size), dtype),
                    jnp.zeros((1, state_dim), dtype),
                )
            )["params"]
            abstract = lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype)
            trainable_shape = {
                "head": jax.tree_util.tree_map(abstract, head_shape)
            }
            if lora_rank > 0:
                from ..io.lora import init_lora

                lora_shape = jax.eval_shape(
                    lambda: init_lora(
                        params_shape, lora_rank, jax.random.PRNGKey(2)
                    )
                )
                trainable_shape["lora"] = jax.tree_util.tree_map(
                    abstract, lora_shape
                )
            compiled = (
                jax.jit(train_step)
                .lower(
                    trainable_shape,
                    jax.tree_util.tree_map(abstract, params_shape),
                    jax.ShapeDtypeStruct(img_shape, dtype),
                    jax.ShapeDtypeStruct((batch, prompt_len), jnp.int32),
                    jax.ShapeDtypeStruct((batch, prompt_len), jnp.int32),
                    jax.ShapeDtypeStruct((batch, state_dim), dtype),
                    jax.ShapeDtypeStruct((batch, action_dim), jnp.float32),
                )
                .compile()
            )
        return compiled_flops(compiled)
    except Exception:  # pragma: no cover - backend dependent
        return None


def mfu(
    flops_per_step: Optional[float],
    step_time_s: float,
    n_chips: int = 1,
    device: Optional[jax.Device] = None,
) -> Optional[float]:
    """Fraction of aggregate peak: model FLOPs / (time * chips * peak)."""
    peak = device_peak_flops(device)
    if flops_per_step is None or peak is None or step_time_s <= 0:
        return None
    return flops_per_step / (step_time_s * n_chips * peak)
