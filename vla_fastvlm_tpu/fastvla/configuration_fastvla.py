"""FastVLA policy configuration.

Parity with reference ``src/vla_fastvlm/fastvla/configuration_fastvla.py``:
same field set and the same ``to_backbone_config()`` translation
(reference ``configuration_fastvla.py:10-46``), extended with TPU-native knobs
(dtypes, image splice mode, action chunking).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..model.fastvlm_adapter import FastVLMBackboneConfig


@dataclass
class FastVLAConfig:
    """Configuration for adapting FastVLM into a VLA policy.

    Mirrors the structure of the SmolVLA config but keeps a FastVLM backbone
    (reference docstring, ``configuration_fastvla.py:11-14``).
    """

    vlm_model_name: str = "apple/FastVLM-0.5B"
    bootstrap_model_name: str = "apple/FastVLM-0.5B"
    state_dim: int = 14
    action_dim: int = 14
    hidden_dim: int = 1024
    fusion_dim: int = 1024
    dropout: float = 0.1
    freeze_backbone: bool = True

    # Preprocessing
    tokenizer_max_length: int = 64
    tokenizer_padding_side: str = "right"
    pad_to_max_length: bool = False
    resize_with_padding: bool = True
    image_size: Optional[int] = None
    pad_value: float = 0.0
    add_trailing_newline: bool = True

    # --- TPU-native knobs (no reference counterpart) ---
    # "prefix" feeds image tokens to the decoder; "none" is strict parity
    # with the reference's effective text-only behavior (see
    # model/fastvlm_adapter.py module docstring).
    image_token_mode: str = "prefix"
    dtype: str = "float32"
    param_dtype: str = "float32"
    attention_impl: str = "auto"  # "auto" | "flash" | "xla"
    vision_block_impl: str = "auto"  # "auto" | "fused" | "xla"
    fused_projections: bool = True  # one-matmul q/k/v and gate/up
    # Weight-only int8 decoder kernels for serving ("none" | "int8"):
    # halves decode weight-HBM traffic (ops/quant.py). Inference-only.
    quantization: str = "none"
    # int8 KV cache storage: halves persistent cache HBM (dense serving).
    kv_cache_quantization: str = "none"
    train_backbone: bool = False
    # Benchmark-only: host-fabricated params at exact init shapes (see
    # FastVLMBackboneConfig.fabricate_params) — stands up 7B-shape policies
    # without device init; values are throughput-irrelevant.
    fabricate_params: bool = False
    # Rematerialize decoder blocks in the backward pass (jax.checkpoint):
    # trades FLOPs for activation memory whenever gradients traverse the
    # decoder — full-backbone training AND LoRA/QLoRA (adapter grads flow
    # through the frozen base's scanned layers; without remat the backward
    # stores all layers' activations, which OOMs 7B at batch 8 on one v5e
    # chip). ``to_backbone_config`` therefore derives remat from
    # ``train_backbone OR lora_rank > 0`` in addition to this flag; in
    # forward-only (inference) programs jax.checkpoint is discharged at
    # trace time, so the derivation never costs serving anything.
    gradient_checkpointing: bool = False
    # LoRA fine-tuning (io/lora.py): rank > 0 mounts low-rank adapters on
    # the decoder projections and trains them alongside the head while the
    # backbone base stays frozen (QLoRA when quantization != "none": int8/
    # int4 frozen base + float adapters — 7B fine-tuning on one v5e chip).
    lora_rank: int = 0
    # Standard LoRA alpha; pre-folded into A's init std (None -> rank, i.e.
    # unit scale). See io/lora.py's pre-scaled convention.
    lora_alpha: Optional[float] = None
    # chunk_size > 1 emits (chunk, action_dim) per forward (action chunking).
    chunk_size: int = 1
    # Autoregressive action-token policy (RT-2/OpenVLA-style;
    # models/action_tokens.py + fastvla/token_policy.py): "token" decodes
    # action_dim discrete tokens through the VLM's lm_head instead of the
    # reference's MLP regression head — no head parameters; train with
    # lora_rank > 0 (QLoRA when quantized) or train_backbone. Makes the
    # decode-serving stack (paged KV / speculative / continuous batching)
    # apply to closed-loop control.
    action_head: str = "mlp"  # "mlp" | "token"
    action_bins: int = 256
    # Clip range of the uniform codebook; actions/states are expected
    # normalized (LeRobot MEAN_STD -> ~N(0,1); widen for raw values).
    action_token_low: float = -1.0
    action_token_high: float = 1.0
    # Cameras per observation; >1 expects (B, ncam, C, H, W) batches and
    # concatenates per-view visual tokens (multi-camera ALOHA).
    num_cameras: int = 1
    seed: int = 0

    def to_backbone_config(self) -> FastVLMBackboneConfig:
        """Translate to the backbone adapter config
        (parity: reference ``configuration_fastvla.py:34-46``)."""
        return FastVLMBackboneConfig(
            model_id=self.vlm_model_name,
            bootstrap_model_id=self.bootstrap_model_name,
            freeze_backbone=self.freeze_backbone,
            force_image_size=self.image_size,
            resize_with_padding=self.resize_with_padding,
            pad_value=self.pad_value,
            tokenizer_max_length=self.tokenizer_max_length,
            tokenizer_padding_side=self.tokenizer_padding_side,
            pad_to_max_length=self.pad_to_max_length,
            image_token_mode=self.image_token_mode,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_impl=self.attention_impl,
            vision_block_impl=self.vision_block_impl,
            fused_projections=self.fused_projections,
            quantization=self.quantization,
            kv_cache_quantization=self.kv_cache_quantization,
            train_backbone=self.train_backbone,
            fabricate_params=self.fabricate_params,
            # Remat whenever gradients traverse the decoder (see the field
            # comment): explicit flag OR full-backbone training OR LoRA/QLoRA.
            gradient_checkpointing=(
                self.gradient_checkpointing
                or self.train_backbone
                or self.lora_rank > 0
            ),
            num_cameras=self.num_cameras,
            seed=self.seed,
        )
