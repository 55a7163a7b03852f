"""Apple FastViTHD checkpoint -> fused Flax vision tower conversion.

The llava_qwen2 checkpoints carry the vision tower under
``model.vision_tower.vision_tower.model.*`` in the ml-fastvlm/MobileCLIP
module layout (reconstructed from Apple's public code; the reference consumes
it opaquely via remote code, ``fastvlm_adapter.py:185-191``):

    patch_embed.{0,1,2}          stem MobileOneBlocks        -> stem_0/1/2
    network.{i}                  interleaved list per stage:
        PatchEmbed(proj.0 = ReparamLargeKernelConv, proj.1 = MobileOneBlock)
                                                             -> patch_embed_s
        RepCPE                   (attention stages)          -> pos_emb_s
        Sequential(blocks)       RepMixerBlock | AttentionBlock
                                                             -> stage{s}_block{b}
    conv_exp                     MobileOneBlock              -> conv_exp

Both storage modes are handled:
- **train-mode** multi-branch params (``rbr_conv/rbr_scale/rbr_skip``,
  RepMixer ``norm``/``mixer``/``layer_scale``, RepLKC ``lkb_origin`` +
  ``small_conv``) — folded with ``io/reparam.py`` (math pinned by tests);
- **inference-mode** fused params (``reparam_conv``, ``lkb_reparam``) —
  direct copies.

CAVEAT: the fold math is exact and unit-tested; the *name mapping* is a
faithful reconstruction that must be validated against a real Apple
checkpoint (none downloadable in this zero-egress environment). On any
unmatched name the converter raises KeyError and the loader falls back to
random init with a warning (``io/model_loader.py``).
"""

from __future__ import annotations

import logging
from typing import Dict, Mapping, Optional

import numpy as np

from ..models.fastvit import FastViTHDConfig
from .reparam import (
    bn_to_affine,
    fuse_large_kernel_conv,
    fuse_mobileone_block,
    fuse_repcpe,
    fuse_repmixer,
)
from .weights import torch_conv_to_flax

logger = logging.getLogger(__name__)

DEFAULT_PREFIX = "model.vision_tower.vision_tower.model."

_BN_KEYS = ("weight", "bias", "running_mean", "running_var")


class _Src:
    """Name-indexed access into the torch state dict with hit tracking."""

    def __init__(self, state: Mapping[str, np.ndarray], prefix: str) -> None:
        self.state = {
            k[len(prefix):]: np.asarray(v)
            for k, v in state.items()
            if k.startswith(prefix)
        }

    def has(self, name: str) -> bool:
        return name in self.state

    def get(self, name: str) -> np.ndarray:
        if name not in self.state:
            raise KeyError(f"vision tower param not found: {name!r}")
        return self.state[name].astype(np.float32)

    def bn(self, base: str) -> dict:
        return {k: self.get(f"{base}.{k}") for k in _BN_KEYS}

    def maybe_bn(self, base: str) -> Optional[dict]:
        return self.bn(base) if self.has(f"{base}.weight") else None


def _mobileone_fused(src: _Src, base: str, kernel: int, out_ch: int, groups: int):
    """MobileOneBlock -> (w_torch, b) fused, from either storage mode."""
    if src.has(f"{base}.reparam_conv.weight"):
        return (
            src.get(f"{base}.reparam_conv.weight"),
            src.get(f"{base}.reparam_conv.bias"),
        )
    conv_branches = []
    j = 0
    while src.has(f"{base}.rbr_conv.{j}.conv.weight"):
        conv_branches.append(
            (src.get(f"{base}.rbr_conv.{j}.conv.weight"), src.bn(f"{base}.rbr_conv.{j}.bn"))
        )
        j += 1
    scale = None
    if src.has(f"{base}.rbr_scale.conv.weight"):
        scale = (src.get(f"{base}.rbr_scale.conv.weight"), src.bn(f"{base}.rbr_scale.bn"))
    skip = src.maybe_bn(f"{base}.rbr_skip")
    if not conv_branches and scale is None and skip is None:
        raise KeyError(f"no MobileOne branches found under {base!r}")
    return fuse_mobileone_block(conv_branches, scale, skip, kernel, out_ch, groups)


def _conv_act(w_torch: np.ndarray, b: np.ndarray) -> Dict:
    o, i, kh, kw = w_torch.shape
    if (kh, kw) == (1, 1) and i != 1:
        # Pointwise ungrouped convs are Dense in our modules: (O, I, 1, 1)
        # -> (I, O). (i == 1 would be a depthwise 1x1, which stays a conv.)
        return {"conv": {"kernel": w_torch[:, :, 0, 0].T, "bias": b}}
    return {"conv": {"kernel": torch_conv_to_flax(w_torch), "bias": b}}


def _repmixer_fused(src: _Src, base: str, dim: int) -> Dict:
    """RepMixer -> our RepDWConv params (replacement conv w/ identity)."""
    if src.has(f"{base}.reparam_conv.weight"):
        return _conv_act(
            src.get(f"{base}.reparam_conv.weight"),
            src.get(f"{base}.reparam_conv.bias"),
        )
    mixer_w, mixer_b = _mobileone_fused(src, f"{base}.mixer", 3, dim, dim)
    norm_w, norm_b = _mobileone_fused(src, f"{base}.norm", 3, dim, dim)
    ls = None
    for ls_name in (f"{base}.layer_scale", f"{base}.layer_scale.gamma"):
        if src.has(ls_name):
            ls = src.get(ls_name).reshape(-1)
            break
    w, b = fuse_repmixer(norm_w, norm_b, mixer_w, mixer_b, ls, dim, 3)
    return _conv_act(w, b)


def _repcpe_fused(src: _Src, base: str, dim: int) -> Dict:
    if src.has(f"{base}.reparam_conv.weight"):
        return _conv_act(
            src.get(f"{base}.reparam_conv.weight"),
            src.get(f"{base}.reparam_conv.bias"),
        )
    w = src.get(f"{base}.pe.weight") if src.has(f"{base}.pe.weight") else src.get(
        f"{base}.proj.weight"
    )
    b_name = f"{base}.pe.bias" if src.has(f"{base}.pe.bias") else f"{base}.proj.bias"
    b = src.get(b_name) if src.has(b_name) else np.zeros(dim, np.float32)
    w, b = fuse_repcpe(w, b, dim, w.shape[-1])
    return _conv_act(w, b)


def _large_kernel_fused(src: _Src, base: str) -> tuple[np.ndarray, np.ndarray]:
    if src.has(f"{base}.lkb_reparam.weight"):
        return src.get(f"{base}.lkb_reparam.weight"), src.get(f"{base}.lkb_reparam.bias")
    lkb_w = src.get(f"{base}.lkb_origin.conv.weight")
    lkb_bn = src.bn(f"{base}.lkb_origin.bn")
    small_w = small_bn = None
    if src.has(f"{base}.small_conv.conv.weight"):
        small_w = src.get(f"{base}.small_conv.conv.weight")
        small_bn = src.bn(f"{base}.small_conv.bn")
    return fuse_large_kernel_conv(lkb_w, lkb_bn, small_w, small_bn, lkb_w.shape[-1])


def _convffn(src: _Src, base: str) -> Dict:
    """ConvFFN: conv(dw7x7)+bn -> dw; fc1/fc2 1x1 convs."""
    from .weights import fold_conv_bn

    bn = src.bn(f"{base}.conv.bn")
    dw_w, dw_b = fold_conv_bn(
        src.get(f"{base}.conv.conv.weight"),
        src.get(f"{base}.conv.conv.bias")
        if src.has(f"{base}.conv.conv.bias")
        else None,
        bn["weight"],
        bn["bias"],
        bn["running_mean"],
        bn["running_var"],
    )
    return {
        "dw": _conv_act(dw_w, dw_b),
        "fc1": _conv_act(src.get(f"{base}.fc1.weight"), src.get(f"{base}.fc1.bias")),
        "fc2": _conv_act(src.get(f"{base}.fc2.weight"), src.get(f"{base}.fc2.bias")),
    }


def _attention(src: _Src, base: str) -> Dict:
    """Attention: qkv/proj Linears -> Dense kernels (in, out)."""
    out: Dict = {
        "qkv": {"kernel": src.get(f"{base}.qkv.weight").T},
        "proj": {
            "kernel": src.get(f"{base}.proj.weight").T,
            "bias": src.get(f"{base}.proj.bias"),
        },
    }
    if src.has(f"{base}.qkv.bias"):
        # our SpatialAttention.qkv is bias-free (FastViT uses qkv bias=False);
        # reject biased checkpoints loudly rather than silently dropping.
        if np.abs(src.get(f"{base}.qkv.bias")).max() > 0:
            raise KeyError(f"{base}.qkv.bias present and nonzero; unsupported")
    return out


def _layer_scale(src: _Src, name: str) -> np.ndarray:
    for candidate in (name, f"{name}.gamma"):
        if src.has(candidate):
            return src.get(candidate).reshape(-1)
    raise KeyError(f"layer scale not found: {name!r}")


def convert_vision_tower(
    state_dict: Mapping[str, np.ndarray],
    cfg: FastViTHDConfig,
    prefix: str = DEFAULT_PREFIX,
    dtype=np.float32,
) -> Dict:
    """Full tower conversion -> our Flax param tree (see module docstring)."""
    src = _Src(state_dict, prefix)
    if not src.state:
        raise KeyError(f"no parameters under prefix {prefix!r}")
    params: Dict = {}

    def put(name: str, tree: Dict) -> None:
        params[name] = tree

    # stem: patch_embed.{0,1,2}
    d0 = cfg.embed_dims[0]
    for idx, (kernel, groups, out_ch) in enumerate(
        [(3, 1, d0), (3, d0, d0), (1, 1, d0)]
    ):
        w, b = _mobileone_fused(src, f"patch_embed.{idx}", kernel, out_ch, groups)
        put(f"stem_{idx}", _conv_act(w, b))

    # network walk
    net_idx = 0
    for stage, (dim, depth, mixer, ratio, cpe) in enumerate(
        zip(cfg.embed_dims, cfg.depths, cfg.token_mixers, cfg.mlp_ratios, cfg.pos_embs)
    ):
        if stage > 0:
            base = f"network.{net_idx}"
            lk_w, lk_b = _large_kernel_fused(src, f"{base}.proj.0")
            pw_w, pw_b = _mobileone_fused(src, f"{base}.proj.1", 1, dim, 1)
            put(
                f"patch_embed_{stage}",
                {"large_kernel": _conv_act(lk_w, lk_b), "pointwise": _conv_act(pw_w, pw_b)},
            )
            net_idx += 1
        if cpe:
            put(f"pos_emb_{stage}", _repcpe_fused(src, f"network.{net_idx}", dim))
            net_idx += 1
        for blk in range(depth):
            base = f"network.{net_idx}.{blk}"
            name = f"stage{stage}_block{blk}"
            if mixer == "repmixer":
                put(
                    name,
                    {
                        "token_mixer": _repmixer_fused(src, f"{base}.token_mixer", dim),
                        "convffn": _convffn(src, f"{base}.convffn"),
                        "layer_scale": {
                            "gamma": _layer_scale(src, f"{base}.layer_scale")
                        },
                    },
                )
            else:  # attention
                scale, bias = bn_to_affine(src.bn(f"{base}.norm"))
                put(
                    name,
                    {
                        "norm": {"scale": scale, "bias": bias},
                        "token_mixer": _attention(src, f"{base}.token_mixer"),
                        "layer_scale_1": {
                            "gamma": _layer_scale(src, f"{base}.layer_scale_1")
                        },
                        "convffn": _convffn(src, f"{base}.convffn"),
                        "layer_scale_2": {
                            "gamma": _layer_scale(src, f"{base}.layer_scale_2")
                        },
                    },
                )
        net_idx += 1

    # conv_exp: depthwise-expand MobileOneBlock
    w, b = _mobileone_fused(
        src, "conv_exp", 3, cfg.out_channels, cfg.embed_dims[-1]
    )
    put("conv_exp", _conv_act(w, b))

    return _cast_tree(params, dtype)


def _cast_tree(tree, dtype):
    if isinstance(tree, dict):
        return {k: _cast_tree(v, dtype) for k, v in tree.items()}
    return np.asarray(tree, dtype=dtype)
