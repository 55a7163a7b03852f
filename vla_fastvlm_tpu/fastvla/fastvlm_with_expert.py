"""FastVLM backbone + action expert head, composed for jit.

Parity surface: reference ``src/vla_fastvlm/fastvla/fastvlm_with_expert.py``
(``FastVLMWithExpert(config).forward(images, states, tasks, device) ->
actions``). TPU-native structure: the backbone feature extraction, pooling,
and head all run inside one jitted function (``apply_fn``); parameters are an
explicit pytree split into ``backbone`` and ``head`` so the trainer can
optimize the head while keeping the backbone frozen (reference freezes via
``requires_grad=False`` + an unconditional ``@torch.no_grad()`` on the
backbone forward — see ``model/fastvlm_adapter.py`` docstring).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..model.fastvlm_adapter import FastVLMBackbone
from ..models.action_head import ActionChunkHead, ActionExpertHead
from .configuration_fastvla import FastVLAConfig


class FastVLMWithExpert:
    """FastVLM backbone plus a lightweight action expert head.

    (Reference docstring: "organized similarly to the SmolVLA reference",
    ``fastvlm_with_expert.py:13-16``. Despite the name, the expert is an MLP
    head, not a separate expert transformer — SURVEY.md §1.)
    """

    def __init__(self, config: FastVLAConfig | None = None) -> None:
        self.config = config or FastVLAConfig()
        cfg = self.config
        self.backbone = FastVLMBackbone(cfg.to_backbone_config())

        head_kwargs = dict(
            state_dim=cfg.state_dim,
            action_dim=cfg.action_dim,
            hidden_dim=cfg.hidden_dim,
            fusion_dim=cfg.fusion_dim,
            dropout=cfg.dropout,
            dtype=self.backbone.model_config.text.dtype,
            param_dtype=self.backbone.model_config.text.param_dtype,
        )
        if cfg.chunk_size > 1:
            self.head = ActionChunkHead(chunk_size=cfg.chunk_size, **head_kwargs)
        else:
            self.head = ActionExpertHead(**head_kwargs)

        feat_dim = self.backbone.output_dim
        self.head_params = self.head.init(
            jax.random.PRNGKey(cfg.seed + 1),
            jnp.zeros((1, feat_dim)),
            jnp.zeros((1, cfg.state_dim)),
        )["params"]

        # LoRA adapters on the decoder projections (io/lora.py): trained
        # with the head while the backbone base stays frozen. QLoRA when
        # the base is quantized (int8/int4 weights + float adapters).
        self.lora = None
        if cfg.lora_rank > 0:
            if cfg.train_backbone and not cfg.freeze_backbone:
                raise ValueError(
                    "lora_rank > 0 with full backbone training is "
                    "contradictory: LoRA exists to avoid training the base"
                )
            from ..io.lora import init_lora

            self.lora = init_lora(
                self.backbone.params,
                rank=cfg.lora_rank,
                rng=jax.random.PRNGKey(cfg.seed + 2),
                alpha=cfg.lora_alpha,
            )

        self._jit_apply = jax.jit(self.apply_fn, static_argnames=("train",))

    # ------------------------------------------------------------------
    # parameters

    @property
    def params(self) -> Dict:
        """Full parameter pytree: {"backbone": ..., "head": ...} plus
        ``"lora"`` when adapters are mounted (``lora_rank > 0``)."""
        out = {"backbone": self.backbone.params, "head": self.head_params}
        if self.lora is not None:
            out["lora"] = self.lora
        return out

    def load_params(self, params: Dict) -> None:
        self.backbone.params = params["backbone"]
        self.head_params = params["head"]
        if "lora" in params:
            self.lora = params["lora"]

    def trainable_params(self) -> Dict:
        """The sub-tree the optimizer updates.

        With ``freeze_backbone`` (and the reference's always-no-grad backbone
        quirk unless ``train_backbone``), only the head trains — plus the
        LoRA adapters when mounted (the base stays frozen either way).
        """
        if self.config.train_backbone and not self.config.freeze_backbone:
            return self.params
        out = {"head": self.head_params}
        if self.lora is not None:
            out["lora"] = self.lora
        return out

    def merge_trainable(self, trainable: Dict) -> Dict:
        full = self.params
        if "backbone" in trainable:
            return trainable
        merged = {"backbone": full["backbone"], "head": trainable["head"]}
        if "lora" in trainable:
            merged["lora"] = trainable["lora"]
        return merged

    # ------------------------------------------------------------------
    # pure compute

    def apply_fn(
        self,
        params: Dict,
        images: jnp.ndarray,  # (B, C, H, W) float
        input_ids: jnp.ndarray,  # (B, T) int32
        attention_mask: jnp.ndarray,  # (B, T) int32
        states: jnp.ndarray,  # (B, state_dim)
        dropout_rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Pure function: full pytree + arrays -> actions."""
        feats = self.backbone.features_fn(
            params["backbone"], images, input_ids, attention_mask,
            lora=params.get("lora"),
        )
        rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
        return self.head.apply(
            {"params": params["head"]},
            feats,
            states,
            deterministic=not train,
            rngs=rngs,
        )

    # ------------------------------------------------------------------
    # eager API (reference parity)

    def forward(
        self,
        images,
        states,
        tasks: List[str],
        device: Optional[jax.Device] = None,
    ) -> jax.Array:
        images = self.backbone._as_bchw(images)
        ids, mask = self.backbone._prep_text(tasks)
        states = np.asarray(states, dtype=np.float32)
        if device is not None:
            images, ids, mask, states = (
                jax.device_put(x, device) for x in (images, ids, mask, states)
            )
        return self._jit_apply(self.params, images, ids, mask, states)

    __call__ = forward
