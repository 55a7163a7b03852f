"""SmoothQuant-style activation smoothing for the w8a8 serving mode.

``quantization="w8a8"`` (``ops/quant.py``) quantizes activations per token
with dynamic symmetric absmax. Its known failure mode — documented in
``docs/SERVING.md`` since the mode landed — is per-*channel* activation
outliers: one hot channel inflates every token's scale and drowns the other
channels' resolution (the observation behind SmoothQuant, PAPERS.md). The
standard fix migrates the outliers into the weights, where per-output-channel
quantization absorbs them:

    y = rms_norm(x, g) @ W  ==  rms_norm(x, g / s) @ (s * W)   (rows of W)

because RMSNorm's weight is a per-channel multiplier applied after the
normalization, so dividing ``g`` by ``s`` divides the matmul *input* by ``s``
channelwise, and multiplying the corresponding kernel *rows* by ``s`` puts it
back — float-identical, but the activation the w8a8 path quantizes now has
its outlier channels flattened by ``s = a^alpha / w^(1-alpha)`` (``a`` =
calibrated activation absmax, ``w`` = weight absmax, both per input channel).

Sites (the only Qwen2 matmuls preceded by a foldable per-channel affine):

- ``input_layernorm``  -> ``q_proj``/``k_proj``/``v_proj`` (shared input, so
  one shared ``s`` from the concatenated kernels);
- ``post_attention_layernorm`` -> ``gate_proj``/``up_proj``;
- optionally the final ``norm`` -> ``lm_head`` (untied models only) — **off
  by default** because it rescales the returned hidden states, which the
  policy path pools (``fastvlm_adapter``): per-layer sites are exactly
  output-invariant, the final site is only logits-invariant.

``o_proj``/``down_proj`` have no preceding affine (their inputs are attention
/ SiLU-gate outputs) and stay unsmoothed, as in the original recipe.

Usage (before ``io.quantize.quantize_params``, on the FLOAT tree)::

    calib = collect_norm_absmax(model, params, images, ids, mask)
    params = smooth_params_w8a8(params, calib, alpha=0.5)
    params = quantize_params(params, mode="w8a8")

No reference counterpart (the reference has no quantized path); quality
deltas are measured by ``scripts/eval_quant_quality.py --smooth-alpha``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

_ATTN_PROJS = ("q_proj", "k_proj", "v_proj")
_MLP_PROJS = ("gate_proj", "up_proj")


def _find_decoder(params) -> tuple:
    """Locate the scanned decoder subtree -> (parent dict path, layers dict).

    Handles the three production trees: ``Qwen2Model`` (``layers`` at the
    root), ``Qwen2ForCausalLM`` (``model/layers``), and ``FastVLM`` /
    policy trees (``language_model/layers``; the backbone adapter nests the
    whole thing deeper, which the recursive walk also finds).
    """
    found = []

    def walk(node, path):
        if not isinstance(node, dict):
            return
        layers = node.get("layers")
        if isinstance(layers, dict) and "input_layernorm" in layers:
            found.append(path)
            return
        for key, value in node.items():
            walk(value, path + (key,))

    walk(params, ())
    if len(found) != 1:
        raise ValueError(
            "expected exactly one scanned decoder ('layers' subtree with "
            f"stacked params); found {len(found)} at {found}. Unscanned "
            "(layers_i) trees are not supported — smooth before unstacking."
        )
    return found[0]


def _get(params, path):
    node = params
    for key in path:
        node = node[key]
    return node


def _scaled(leaf, s, *, divide: bool, expand: bool):
    """leaf * s (or / s) in f32, cast back to the leaf's dtype.

    ``expand`` appends a trailing axis to ``s`` (kernel rows (..., K, N) vs
    norm weights (..., K)). numpy leaves stay numpy (host-side 7B trees must
    not stage through the chip — same rationale as ``ops/quant.py``).
    """
    mod = np if isinstance(leaf, np.ndarray) else jnp
    s32 = mod.asarray(s, mod.float32)
    if expand:
        s32 = s32[..., None]
    out = mod.asarray(leaf, mod.float32)
    out = out / s32 if divide else out * s32
    return out.astype(leaf.dtype)


def _weight_absmax(kernels) -> np.ndarray:
    """Per-input-channel absmax over a group of (L, K, N) kernels -> (L, K)."""
    mats = [np.max(np.abs(np.asarray(k, np.float32)), axis=-1) for k in kernels]
    return np.maximum.reduce(mats)


def _smooth_scales(act_absmax, weight_absmax, alpha: float) -> np.ndarray:
    """SmoothQuant migration strength: s = a^alpha / w^(1-alpha), clipped.

    Channels the calibration never activated (a == 0) keep s = 1; the clip
    bounds pathological ratios so bf16 params cannot over/underflow.
    """
    a = np.asarray(act_absmax, np.float32)
    w = np.maximum(np.asarray(weight_absmax, np.float32), 1e-8)
    s = np.power(np.maximum(a, 1e-8), alpha) / np.power(w, 1.0 - alpha)
    s = np.where(a > 0, s, 1.0)
    return np.clip(s, 1e-4, 1e4)


def smooth_params_w8a8(
    params,
    calib: dict,
    alpha: float = 0.5,
    include_lm_head: bool = False,
):
    """Fold activation outliers into the weights (float-identical transform).

    ``calib`` comes from ``collect_norm_absmax``: ``{"attn": (L, H),
    "mlp": (L, H), "final": (H,)}`` per-channel activation absmaxes of the
    norm outputs. Returns a new tree; per-layer smoothing leaves every model
    output bit-unchanged in exact arithmetic (bf16 params round-trip at bf16
    epsilon). ``include_lm_head`` additionally smooths the final norm into
    ``lm_head`` — logits-invariant but NOT hidden-state-invariant: enable
    only for pure-LM serving (tied-embedding models have no lm_head and
    reject it).
    """
    path = _find_decoder(params)
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    parent = _get(out, path) if path else out
    # Rebuild the mutated nodes without aliasing the input tree's dicts.
    parent = dict(parent)
    layers = dict(parent["layers"])
    attn = dict(layers["self_attn"])
    mlp = dict(layers["mlp"])

    s_attn = _smooth_scales(
        calib["attn"],
        _weight_absmax([attn[n]["kernel"] for n in _ATTN_PROJS]),
        alpha,
    )
    layers["input_layernorm"] = {
        "weight": _scaled(
            layers["input_layernorm"]["weight"], s_attn, divide=True, expand=False
        )
    }
    for name in _ATTN_PROJS:
        leaf = dict(attn[name])
        leaf["kernel"] = _scaled(leaf["kernel"], s_attn, divide=False, expand=True)
        attn[name] = leaf

    s_mlp = _smooth_scales(
        calib["mlp"],
        _weight_absmax([mlp[n]["kernel"] for n in _MLP_PROJS]),
        alpha,
    )
    layers["post_attention_layernorm"] = {
        "weight": _scaled(
            layers["post_attention_layernorm"]["weight"],
            s_mlp,
            divide=True,
            expand=False,
        )
    }
    for name in _MLP_PROJS:
        leaf = dict(mlp[name])
        leaf["kernel"] = _scaled(leaf["kernel"], s_mlp, divide=False, expand=True)
        mlp[name] = leaf

    layers["self_attn"] = attn
    layers["mlp"] = mlp
    parent["layers"] = layers

    if include_lm_head:
        head = _find_lm_head(out, path)
        if head is None:
            raise ValueError(
                "include_lm_head=True but the tree has no lm_head (tied "
                "embeddings compute logits through the embedding table, "
                "which doubles as the input lookup and cannot be smoothed)"
            )
        head_parent_path, head_key = head
        s_final = _smooth_scales(
            calib["final"],
            _weight_absmax([_get(out, head_parent_path)[head_key]["kernel"]]),
            alpha,
        )
        parent["norm"] = {
            "weight": _scaled(
                parent["norm"]["weight"], s_final, divide=True, expand=False
            )
        }
        head_parent = _get(out, head_parent_path)
        leaf = dict(head_parent[head_key])
        leaf["kernel"] = _scaled(leaf["kernel"], s_final, divide=False, expand=True)
        head_parent = dict(head_parent)
        head_parent[head_key] = leaf
        out = _set(out, head_parent_path, head_parent)

    return _set(out, path, parent)


def _set(params, path, value):
    if not path:
        return value
    node = dict(params)
    node[path[0]] = _set(node[path[0]], path[1:], value)
    return node


def _find_lm_head(params, decoder_path) -> Optional[tuple]:
    """Path of the lm_head sibling of the decoder, or None (tied models).

    ``Qwen2ForCausalLM`` keeps it beside ``model`` (one level above the
    decoder); ``FastVLM`` beside ``language_model`` (same level shape).
    """
    for up in range(len(decoder_path) + 1):
        parent_path = decoder_path[: len(decoder_path) - up]
        node = _get(params, parent_path)
        if isinstance(node, dict) and "lm_head" in node:
            return parent_path, "lm_head"
    return None


def _unstack_layers(params, path, num_layers: int):
    """Scanned (L, ...) layer stack -> layers_0..layers_{L-1} twin tree."""
    parent = dict(_get(params, path))
    stacked = parent.pop("layers")
    for i in range(num_layers):
        parent[f"layers_{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], stacked
        )
    return _set(params, path, parent)


def collect_norm_absmax(model, params, *apply_args, **apply_kwargs) -> dict:
    """Calibrate per-channel activation absmax at the smoothing sites.

    Runs ONE forward of ``model`` (``FastVLM``, ``Qwen2ForCausalLM`` or
    ``Qwen2Model``) on the given inputs with Flax ``capture_intermediates``
    filtered to the RMSNorm modules, via a twin with ``scan_layers=False``
    (intermediates cannot be sown out of the scanned stack) and the layer
    stack unstacked to match. Returns ``{"attn": (L, H), "mlp": (L, H),
    "final": (H,)}``.

    Calibrate with a representative, fully-valid batch: padded positions
    count toward the absmax (their norm outputs are real activations of the
    pad embedding), so prefer unpadded calibration prompts.
    """
    from ..models.qwen2 import RMSNorm

    cfg = model.cfg
    if hasattr(cfg, "text"):  # FastVLM
        if not cfg.text.scan_layers:
            raise ValueError("calibration twin expects the scanned production cfg")
        twin = type(model)(cfg.replace(text=cfg.text.replace(scan_layers=False)))
        num_layers = cfg.text.num_hidden_layers
    else:
        if not cfg.scan_layers:
            raise ValueError("calibration twin expects the scanned production cfg")
        twin = type(model)(cfg.replace(scan_layers=False))
        num_layers = cfg.num_hidden_layers

    path = _find_decoder(params)
    twin_params = _unstack_layers(params, path, num_layers)

    _, state = twin.apply(
        {"params": twin_params},
        *apply_args,
        capture_intermediates=lambda mdl, _name: isinstance(mdl, RMSNorm),
        mutable=["intermediates"],
        **apply_kwargs,
    )
    inter = _get(state["intermediates"], path)

    def absmax(node_name: str, layer: int) -> np.ndarray:
        (value,) = inter[f"layers_{layer}"][node_name]["__call__"]
        v = np.asarray(value, np.float32)
        return np.max(np.abs(v), axis=tuple(range(v.ndim - 1)))

    attn = np.stack([absmax("input_layernorm", i) for i in range(num_layers)])
    mlp = np.stack(
        [absmax("post_attention_layernorm", i) for i in range(num_layers)]
    )
    (final_value,) = inter["norm"]["__call__"]
    final = np.max(
        np.abs(np.asarray(final_value, np.float32)),
        axis=tuple(range(final_value.ndim - 1)),
    )
    return {"attn": attn, "mlp": mlp, "final": final}
