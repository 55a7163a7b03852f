"""FastViTHD hybrid vision encoder in Flax, TPU-first.

The reference consumes this encoder opaquely inside Apple's ``llava_qwen2``
HF checkpoint remote code (reference ``fastvlm_adapter.py:185-191``, invoked at
``fastvlm_adapter.py:533``); there is no in-repo implementation to port, so this
module re-creates the published FastViTHD architecture (FastVLM paper,
arXiv 2412.13303; FastViT, arXiv 2303.14189) natively for TPU:

- **NHWC layout** end to end (XLA TPU's native conv layout; NCHW inputs are
  transposed once at the model boundary).
- **Inference-reparameterized blocks as the canonical form.** FastViT's
  train-time multi-branch blocks (MobileOne k×k + 1×1 + BN-identity branches,
  RepMixer's norm/mixer branches, RepCPE) all algebraically collapse into a
  single conv per block. We implement the collapsed form directly — fewer,
  larger convs for the MXU — and fold branches/BN at checkpoint-conversion
  time instead of at runtime (``vla_fastvlm_tpu/io/weights.py``).
- Every op is shape-static and jit-safe; the whole encoder is one XLA program
  that fuses with the mm projector and decoder prefill.

Architecture (FastViTHD, the "HD" 5-stage hybrid used by all FastVLM
checkpoints): stem (4x downsample) -> 5 stages of [RepMixer, RepMixer,
RepMixer, Attention, Attention] blocks with patch-embed downsamples between
stages (2x each) -> final depthwise-expand conv. Total downsample 64x, so a
1024x1024 input yields 16x16 = 256 visual tokens of width 3072.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class FastViTHDConfig:
    """FastViTHD hyperparameters (defaults = the FastVLM checkpoints' tower)."""

    embed_dims: Tuple[int, ...] = (96, 192, 384, 768, 1536)
    depths: Tuple[int, ...] = (2, 12, 24, 4, 2)
    token_mixers: Tuple[str, ...] = (
        "repmixer", "repmixer", "repmixer", "attention", "attention",
    )
    mlp_ratios: Tuple[float, ...] = (4.0, 4.0, 4.0, 4.0, 4.0)
    # RepCPE conditional positional encoding before each attention stage.
    pos_embs: Tuple[bool, ...] = (False, False, False, True, True)
    attn_head_dim: int = 32
    # Final conv expansion ratio: 1536 -> 3072 visual feature width.
    final_expand_ratio: float = 2.0
    layer_scale_init: float = 1e-5
    # RepMixer block implementation: "auto" picks the fused Pallas block
    # kernel (ops/pallas/repmixer.py) on TPU when the shape qualifies,
    # "fused" forces it (error when unsupported — no silent fallback),
    # "xla" keeps the unfused composition.
    block_impl: str = "auto"
    # Per-channel affine in attention blocks: folded inference BatchNorm.
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return int(self.embed_dims[-1] * self.final_expand_ratio)

    @property
    def downsample_factor(self) -> int:
        # stem 4x, then one 2x patch embed before each stage after the first.
        return 4 * (2 ** (len(self.depths) - 1))

    def replace(self, **kw) -> "FastViTHDConfig":
        return dataclasses.replace(self, **kw)


def fastvithd(**kw) -> FastViTHDConfig:
    return FastViTHDConfig(**kw)


def fastvithd_tiny(**kw) -> FastViTHDConfig:
    """Tiny variant for tests (SURVEY.md §4: tiny-config fake backbone)."""
    return FastViTHDConfig(
        embed_dims=(8, 16, 24, 32, 48),
        depths=(1, 1, 1, 1, 1),
        attn_head_dim=16,
        **kw,
    )


class ConvAct(nn.Module):
    """Conv + bias (+ optional GELU): the fused form of FastViT's Conv+BN(+act).

    Train-time FastViT uses Conv2d followed by BatchNorm; at inference BN folds
    into the conv's kernel/bias, which is the only form we keep.

    Pointwise (1x1, ungrouped) convs are expressed as a Dense over the channel
    axis: numerically identical, but measured ~3x faster than XLA's conv
    lowering on v5e (the MXU path engages directly). The parameter keeps the
    name "conv" with kernel shape (C, F); the checkpoint converter squeezes
    1x1 conv kernels accordingly (``io/vision_convert.py``).
    """

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kernel == 1 and self.groups == 1 and self.stride == 1:
            x = nn.Dense(
                self.features,
                use_bias=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding="SAME",
                feature_group_count=self.groups,
                use_bias=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
        return nn.gelu(x) if self.act else x


class RepDWConv(nn.Module):
    """Reparameterized depthwise conv that *replaces* its input.

    Fused form of RepMixer (``x + ls*(mixer(x) - norm(x))`` -> one dw conv) and
    RepCPE (``x + dwconv(x)`` -> one dw conv). The identity shortcut lives
    inside the kernel weights, so we initialize the kernel to the identity
    (dirac) so a freshly initialized network starts as a no-op mixer, matching
    the behavior of the unfused block at init.
    """

    kernel: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]

        def dirac_init(key, shape, dtype):
            w = jnp.zeros(shape, dtype)
            center = self.kernel // 2
            # Depthwise kernel shape: (kh, kw, 1, C); identity = 1 at center.
            return w.at[center, center, 0, :].set(1.0)

        x = nn.Conv(
            c,
            (self.kernel, self.kernel),
            padding="SAME",
            feature_group_count=c,
            use_bias=True,
            kernel_init=dirac_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        return x


class PatchEmbed(nn.Module):
    """Stage-transition downsampler: large-kernel dw conv (s2) + pointwise.

    Fused form of FastViT's ReparamLargeKernelConv(7x7, stride 2) +
    MobileOneBlock(1x1) pair.
    """

    features: int
    cfg: FastViTHDConfig

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # FastViT uses groups=in_channels (out is always a multiple of in for
        # the published dims); gcd keeps odd test configs valid.
        groups = math.gcd(in_ch, self.features)
        x = ConvAct(
            self.features, kernel=7, stride=2, groups=groups, act=True,
            dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype,
            name="large_kernel",
        )(x)
        x = ConvAct(
            self.features, kernel=1, act=True,
            dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype,
            name="pointwise",
        )(x)
        return x


class ConvFFN(nn.Module):
    """FastViT ConvFFN: dw 7x7 + pointwise MLP with GELU, residual outside."""

    hidden: int
    cfg: FastViTHDConfig

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = ConvAct(
            c, kernel=7, groups=c, act=False,
            dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype,
            name="dw",
        )(x)
        x = ConvAct(
            self.hidden, kernel=1, act=True,
            dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype,
            name="fc1",
        )(x)
        x = ConvAct(
            c, kernel=1, act=False,
            dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype,
            name="fc2",
        )(x)
        return x


class LayerScale(nn.Module):
    dim: int
    init: float
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.init),
            (self.dim,),
            self.param_dtype,
        )
        return x * gamma


class ChannelAffine(nn.Module):
    """Per-channel scale+shift: the inference form of BatchNorm2d."""

    dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
        return x * scale + bias


class RepMixerBlock(nn.Module):
    """Token mixing via reparameterized dw conv + ConvFFN.

    Dispatches between the unfused Flax composition and the fused Pallas
    block kernel (``ops/pallas/repmixer.py`` — one HBM round trip per block
    instead of five) per ``cfg.block_impl``. Both paths share the same
    parameter tree; exactness is pinned by ``tests/test_repmixer_kernel.py``.
    """

    cfg: FastViTHDConfig
    mlp_ratio: float

    def _use_fused(self, x, hidden: int) -> bool:
        from ..ops.pallas.repmixer import supports_fused_repmixer

        impl = self.cfg.block_impl
        if impl == "xla":
            return False
        if impl == "fused":
            # Explicit force: only the shape must qualify (backend is the
            # user's call — e.g. interpreter mode in tests). Errors instead
            # of silently degrading.
            if not supports_fused_repmixer(tuple(x.shape), hidden, backend="tpu"):
                raise ValueError(
                    f"block_impl='fused' but shape {x.shape} hidden={hidden} "
                    "is unsupported by the fused RepMixer kernel"
                )
            return True
        supported = supports_fused_repmixer(tuple(x.shape), hidden)
        if impl == "auto":
            from ..ops.pallas.repmixer import AUTO_PROFITABLE

            return supported and AUTO_PROFITABLE
        raise ValueError(f"unknown block_impl {impl!r}")

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        cfg = self.cfg
        hidden = int(c * self.mlp_ratio)
        if not self.is_initializing() and self._use_fused(x, hidden):
            from ..ops.pallas.repmixer import repmixer_block

            p = self.variables["params"]
            ffn = p["convffn"]
            return repmixer_block(
                x.astype(cfg.dtype),
                p["token_mixer"]["conv"]["kernel"],
                p["token_mixer"]["conv"]["bias"],
                ffn["dw"]["conv"]["kernel"],
                ffn["dw"]["conv"]["bias"],
                ffn["fc1"]["conv"]["kernel"],
                ffn["fc1"]["conv"]["bias"],
                ffn["fc2"]["conv"]["kernel"],
                ffn["fc2"]["conv"]["bias"],
                p["layer_scale"]["gamma"],
            )
        x = RepDWConv(3, cfg.dtype, cfg.param_dtype, name="token_mixer")(x)
        ffn = ConvFFN(int(c * self.mlp_ratio), cfg, name="convffn")(x)
        ffn = LayerScale(c, cfg.layer_scale_init, cfg.param_dtype, name="layer_scale")(ffn)
        return x + ffn


class SpatialAttention(nn.Module):
    """MHSA over flattened spatial tokens (FastViT attention stages)."""

    cfg: FastViTHDConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, h, w, c = x.shape
        n_heads = c // cfg.attn_head_dim
        tokens = x.reshape(b, h * w, c)

        qkv = nn.Dense(
            3 * c, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="qkv",
        )(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, h * w, n_heads, cfg.attn_head_dim)
        k = k.reshape(b, h * w, n_heads, cfg.attn_head_dim)
        v = v.reshape(b, h * w, n_heads, cfg.attn_head_dim)
        out = dot_product_attention(q, k, v)  # full (non-causal) attention
        out = out.reshape(b, h * w, c)
        out = nn.Dense(
            c, use_bias=True, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="proj",
        )(out)
        return out.reshape(b, h, w, c)


class AttentionBlock(nn.Module):
    """FastViT attention block: BN(affine) -> MHSA, then ConvFFN; layer-scaled."""

    cfg: FastViTHDConfig
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        c = x.shape[-1]
        h = ChannelAffine(c, cfg.param_dtype, name="norm")(x)
        h = SpatialAttention(cfg, name="token_mixer")(h)
        h = LayerScale(c, cfg.layer_scale_init, cfg.param_dtype, name="layer_scale_1")(h)
        x = x + h
        ffn = ConvFFN(int(c * self.mlp_ratio), cfg, name="convffn")(x)
        ffn = LayerScale(c, cfg.layer_scale_init, cfg.param_dtype, name="layer_scale_2")(ffn)
        return x + ffn


class FastViTHD(nn.Module):
    """The full encoder: (B, H, W, 3) NHWC in [0, 1] -> (B, N, C_out) tokens.

    Also accepts NCHW (B, 3, H, W) — the reference's model-facing layout
    (``fastvlm_adapter.py:479-488``) — detected by the channel dim.
    """

    cfg: FastViTHDConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if images.ndim != 4:
            raise ValueError(f"expected 4D image batch, got {images.shape}")
        if images.shape[1] == 3 and images.shape[-1] != 3:
            images = jnp.transpose(images, (0, 2, 3, 1))  # NCHW -> NHWC
        x = images.astype(cfg.dtype)

        # Stem: 4x downsample (fused MobileOne blocks: s2 conv, s2 dw, pw).
        d0 = cfg.embed_dims[0]
        x = ConvAct(d0, 3, stride=2, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="stem_0")(x)
        x = ConvAct(d0, 3, stride=2, groups=d0, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="stem_1")(x)
        x = ConvAct(d0, 1, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="stem_2")(x)

        for stage, (dim, depth, mixer, ratio, cpe) in enumerate(
            zip(cfg.embed_dims, cfg.depths, cfg.token_mixers, cfg.mlp_ratios,
                cfg.pos_embs)
        ):
            if stage > 0:
                x = PatchEmbed(dim, cfg, name=f"patch_embed_{stage}")(x)
            if cpe:
                x = RepDWConv(7, cfg.dtype, cfg.param_dtype,
                              name=f"pos_emb_{stage}")(x)
            for blk in range(depth):
                if mixer == "repmixer":
                    x = RepMixerBlock(cfg, ratio, name=f"stage{stage}_block{blk}")(x)
                elif mixer == "attention":
                    x = AttentionBlock(cfg, ratio, name=f"stage{stage}_block{blk}")(x)
                else:
                    raise ValueError(f"unknown token mixer {mixer!r}")

        # Final depthwise channel expansion (MobileCLIP conv_exp): C -> 2C.
        x = ConvAct(
            cfg.out_channels, kernel=3, groups=cfg.embed_dims[-1], act=True,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv_exp",
        )(x)

        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)
