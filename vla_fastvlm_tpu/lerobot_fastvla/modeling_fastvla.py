"""LeRobot policy wrapper around the TPU FastVLMWithExpert.

Parity with reference ``src/vla_fastvlm/lerobot_fastvla/modeling_fastvla.py``:
``PreTrainedPolicy`` subclass named "fastvla", key resolution from
``input_features`` (:53-67), dim inference (:69-73), action queue
``select_action``/``predict_action_chunk`` (:78-125), training
``forward -> (loss, dict)`` (:127-133).

torch boundary: LeRobot's trainer owns a torch AdamW over this module's
parameters; here those are mirrors of the JAX head (``torch_bridge``), the
loss flows through a custom autograd Function whose backward returns the
TPU-computed gradients, and the frozen backbone never crosses the boundary.
"""

from __future__ import annotations

from collections import deque
from typing import Any

import numpy as np
import torch
from torch import Tensor

from lerobot.configs.types import FeatureType
from lerobot.policies.pretrained import PreTrainedPolicy
from lerobot.utils.constants import ACTION

from ..fastvla.configuration_fastvla import FastVLAConfig as CoreFastVLAConfig
from ..fastvla.fastvlm_with_expert import FastVLMWithExpert
from ..io.checkpoint import flatten_params
from .configuration_fastvla import FastVLAConfig
from .torch_bridge import make_torch_loss, torch_to_head

import jax


class FastVLAPolicy(PreTrainedPolicy):
    """LeRobot policy wrapper for the TPU FastVLMWithExpert."""

    config_class = FastVLAConfig
    name = "fastvla"

    def __init__(self, config: FastVLAConfig, **kwargs: Any):
        super().__init__(config)
        config.validate_features()
        self.config = config

        self._state_key, self._image_keys = self._resolve_input_keys()
        self._infer_io_dims_from_features()

        core_cfg = CoreFastVLAConfig(
            vlm_model_name=self.config.vlm_model_name,
            bootstrap_model_name=self.config.bootstrap_model_name,
            state_dim=self.config.state_dim,
            action_dim=self.config.action_dim,
            hidden_dim=self.config.hidden_dim,
            fusion_dim=self.config.fusion_dim,
            dropout=self.config.dropout,
            freeze_backbone=self.config.freeze_backbone,
            tokenizer_max_length=self.config.tokenizer_max_length,
            tokenizer_padding_side=self.config.tokenizer_padding_side,
            pad_to_max_length=self.config.pad_to_max_length,
            resize_with_padding=self.config.resize_with_padding,
            image_size=self.config.image_size,
            pad_value=self.config.pad_value,
            add_trailing_newline=self.config.add_trailing_newline,
            image_token_mode=self.config.image_token_mode,
            dtype=self.config.jax_dtype,
            chunk_size=self.config.chunk_size,
        )
        self.model = FastVLMWithExpert(core_cfg)

        # Mirror the trainable head into torch Parameters that LeRobot's
        # optimizer updates; JAX recomputes from these every loss call.
        flat = flatten_params(jax.device_get(self.model.head_params))
        self._param_names = sorted(flat)
        self._torch_head = torch.nn.ParameterDict(
            {
                name.replace(".", "__"): torch.nn.Parameter(
                    torch.from_numpy(np.asarray(flat[name]).copy())
                )
                for name in self._param_names
            }
        )

        import jax as _jax
        import jax.numpy as jnp

        # One jitted loss+grad program; frozen backbone params enter as an
        # argument (a closure capture would bake ~GB of constants into HLO).
        def scalar_loss(trainable, frozen, images, ids, mask, states, actions):
            preds = self.model.apply_fn(
                {**frozen, **trainable}, images, ids, mask, states
            )
            return jnp.mean(jnp.square(preds - actions.astype(preds.dtype)))

        jitted_vag = _jax.jit(_jax.value_and_grad(scalar_loss))

        def value_and_grad(head_tree, arrays):
            trainable = {"head": head_tree}
            frozen = {"backbone": self.model.backbone.params}
            loss, grads = jitted_vag(
                trainable,
                frozen,
                arrays["images"],
                arrays["input_ids"],
                arrays["attention_mask"],
                arrays["states"],
                arrays["actions"],
            )
            return float(loss), grads["head"]

        self._torch_loss = make_torch_loss(value_and_grad, self._param_names)
        self.reset()

    # ------------------------------------------------------------------

    def _resolve_input_keys(self) -> tuple[str, list[str]]:
        if not self.config.input_features:
            raise ValueError("FastVLA requires input_features to be set.")
        state_keys = [
            key
            for key, ft in self.config.input_features.items()
            if ft.type is FeatureType.STATE
        ]
        image_keys = [
            key
            for key, ft in self.config.input_features.items()
            if ft.type is FeatureType.VISUAL
        ]
        if not state_keys:
            raise ValueError("No state feature found in input_features.")
        if not image_keys:
            raise ValueError("No visual feature found in input_features.")
        return state_keys[0], image_keys

    def _infer_io_dims_from_features(self) -> None:
        if self.config.input_features and self._state_key in self.config.input_features:
            self.config.state_dim = self.config.input_features[self._state_key].shape[0]
        if self.config.action_feature is not None:
            self.config.action_dim = self.config.action_feature.shape[0]

    def get_optim_params(self) -> dict:
        return self.parameters()

    def reset(self):
        self._action_queue: deque[Tensor] = deque(
            [], maxlen=self.config.n_action_steps
        )

    # ------------------------------------------------------------------

    def _sync_head_from_torch(self) -> None:
        self.model.head_params = torch_to_head(
            {
                name: self._torch_head[name.replace(".", "__")]
                for name in self._param_names
            }
        )

    def _prepare_inputs(self, batch: dict[str, Tensor]):
        image_key = self._image_keys[0]
        images = batch[image_key]
        if images.ndim == 5:
            images = images[:, -1]
        states = batch[self._state_key]
        if states.ndim == 3:
            states = states[:, -1]

        task = batch.get("task")
        batch_size = images.shape[0]
        if task is None:
            tasks = [""] * batch_size
        elif isinstance(task, str):
            tasks = [task] * batch_size
        elif isinstance(task, (list, tuple)):
            tasks = [str(t) for t in task]
            if len(tasks) == 1 and batch_size > 1:
                tasks = tasks * batch_size
        else:
            tasks = [str(task)] * batch_size

        if self.config.add_trailing_newline:
            tasks = [t if t.endswith("\n") else f"{t}\n" for t in tasks]
        return images, states, tasks

    def _arrays_from_batch(self, batch: dict[str, Tensor], with_actions: bool):
        images, states, tasks = self._prepare_inputs(batch)
        images = self.model.backbone._as_bchw(images.detach().cpu().numpy())
        states = np.asarray(states.detach().cpu().numpy(), dtype=np.float32)
        ids, mask = self.model.backbone._prep_text(tasks)
        arrays = {
            "images": images,
            "states": states,
            "input_ids": ids,
            "attention_mask": mask,
        }
        if with_actions:
            gt = batch[ACTION]
            if gt.ndim == 3:
                gt = gt[:, 0]
            arrays["actions"] = np.asarray(gt.detach().cpu().numpy(), np.float32)
        return arrays

    def _predict_actions(self, batch: dict[str, Tensor]) -> Tensor:
        self._sync_head_from_torch()
        arrays = self._arrays_from_batch(batch, with_actions=False)
        actions = self.model._jit_apply(
            self.model.params,
            arrays["images"],
            arrays["input_ids"],
            arrays["attention_mask"],
            arrays["states"],
        )
        return torch.from_numpy(np.asarray(jax.device_get(actions)).copy())

    @torch.no_grad()
    def predict_action_chunk(self, batch: dict[str, Tensor]) -> Tensor:
        self.eval()
        actions = self._predict_actions(batch)
        if actions.ndim == 2:
            actions = actions.unsqueeze(1)  # [B, chunk=1, D]
        return actions

    @torch.no_grad()
    def select_action(self, batch: dict[str, Tensor]) -> Tensor:
        self.eval()
        if len(self._action_queue) == 0:
            chunk = self.predict_action_chunk(batch)[:, : self.config.n_action_steps]
            self._action_queue.extend(chunk.transpose(0, 1))
        return self._action_queue.popleft()

    def forward(self, batch: dict[str, Tensor]) -> tuple[Tensor, dict]:
        arrays = self._arrays_from_batch(batch, with_actions=True)
        flat_params = [
            self._torch_head[name.replace(".", "__")] for name in self._param_names
        ]
        loss = self._torch_loss(arrays, flat_params)
        return loss, {"loss": loss.item(), "mse": loss.item()}
