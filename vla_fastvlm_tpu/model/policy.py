"""Legacy FastVLM policy (first-generation stack).

Parity with reference ``src/vla_fastvlm/model/policy.py:13-118``: same config
shape (nested ``backbone: FastVLMBackboneConfig``), same head architecture,
same ``forward`` / ``compute_loss`` / ``select_action`` / ``reset`` surface.
Kept because the checkpoint loader dispatches to it for configs without a
``vlm_model_name`` key (reference ``utils/checkpoint.py:33-39``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.action_head import ActionExpertHead
from .fastvlm_adapter import FastVLMBackbone, FastVLMBackboneConfig


@dataclass
class FastVLMPolicyConfig:
    backbone: FastVLMBackboneConfig = field(default_factory=FastVLMBackboneConfig)
    state_dim: int = 14
    action_dim: int = 14
    hidden_dim: int = 1024
    fusion_dim: int = 1024
    dropout: float = 0.1
    freeze_backbone: bool = True


class FastVLMPolicy:
    """Vision-Language-Action policy composed of FastVLM backbone + action head."""

    def __init__(self, config: FastVLMPolicyConfig | None = None) -> None:
        self.config = config or FastVLMPolicyConfig()
        cfg = self.config
        self.backbone = FastVLMBackbone(cfg.backbone)

        self.head = ActionExpertHead(
            state_dim=cfg.state_dim,
            action_dim=cfg.action_dim,
            hidden_dim=cfg.hidden_dim,
            fusion_dim=cfg.fusion_dim,
            dropout=cfg.dropout,
            dtype=self.backbone.model_config.text.dtype,
            param_dtype=self.backbone.model_config.text.param_dtype,
        )
        self.head_params = self.head.init(
            jax.random.PRNGKey(cfg.backbone.seed + 1),
            jnp.zeros((1, self.backbone.output_dim)),
            jnp.zeros((1, cfg.state_dim)),
        )["params"]
        self._jit_apply = jax.jit(self._apply_fn, static_argnames=("train",))

    @property
    def params(self) -> Dict:
        return {"backbone": self.backbone.params, "head": self.head_params}

    def load_params(self, params: Dict) -> None:
        self.backbone.params = params["backbone"]
        self.head_params = params["head"]

    def _apply_fn(self, params, images, input_ids, attention_mask, states,
                  dropout_rng=None, train: bool = False):
        feats = self.backbone.features_fn(
            params["backbone"], images, input_ids, attention_mask
        )
        rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
        return self.head.apply(
            {"params": params["head"]}, feats, states,
            deterministic=not train, rngs=rngs,
        )

    def _normalize_tasks(self, tasks: List[str] | str, batch_size: int) -> List[str]:
        """Broadcast a single task string and force a trailing newline
        (parity: reference ``policy.py:51-62``)."""
        if isinstance(tasks, str):
            tasks = [tasks]
        tasks = list(tasks)
        if len(tasks) == 1 and batch_size > 1:
            tasks = [tasks[0] for _ in range(batch_size)]
        return [task if task.endswith("\n") else f"{task}\n" for task in tasks]

    def forward(
        self,
        images,
        states,
        tasks: List[str] | str,
        device: Optional[jax.Device] = None,
    ) -> jax.Array:
        images = np.asarray(images, dtype=np.float32)
        if images.ndim == 5:
            images = images[:, -1]
        if images.ndim != 4:
            raise ValueError(f"Expected images to be (B,C,H,W) got {images.shape}")
        states = np.asarray(states, dtype=np.float32)
        if states.ndim == 3:
            states = states[:, -1]

        tasks = self._normalize_tasks(tasks, batch_size=images.shape[0])
        images = self.backbone._as_bchw(images)
        ids, mask = self.backbone._prep_text(tasks)
        if device is not None:
            images, ids, mask, states = (
                jax.device_put(x, device) for x in (images, ids, mask, states)
            )
        return self._jit_apply(self.params, images, ids, mask, states)

    __call__ = forward

    def compute_loss(self, batch: Dict) -> Dict[str, jax.Array]:
        """Compute regression loss for a batch."""
        predictions = self.forward(batch["images"], batch["states"], batch["tasks"])
        actions = jnp.asarray(np.asarray(batch["actions"], dtype=np.float32))
        mse = jnp.mean(jnp.square(predictions - actions.astype(predictions.dtype)))
        return {"loss": mse, "mse": mse}

    def select_action(self, image, state, task: str,
                      device: Optional[jax.Device] = None) -> jax.Array:
        """Produce a single action for inference scenarios."""
        image_batch = np.asarray(image, dtype=np.float32)[None]
        state_batch = np.asarray(state, dtype=np.float32)[None]
        tasks = self._normalize_tasks(task, batch_size=1)
        action = self.forward(image_batch, state_batch, tasks, device=device)
        return action[0]

    def reset(self) -> None:
        """Provided for API compatibility with LeRobot."""
        return
