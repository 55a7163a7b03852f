"""FastVLA policy: processor + FastVLMWithExpert + loss/inference API.

Parity surface: reference ``src/vla_fastvlm/fastvla/modeling_fastvla.py:14-77``
(``forward``, ``compute_loss`` returning ``{"loss","mse"}``, ``select_action``,
``reset``, ``name="fastvla"``). The loss path is a single jitted program (image
prep + VLM prefill + pooling + head + MSE) exposed as ``loss_fn`` for the
trainer.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configuration_fastvla import FastVLAConfig
from .fastvlm_with_expert import FastVLMWithExpert
from .processor_fastvla import FastVLAProcessor


class FastVLAPolicy:
    """FastVLM -> VLA policy modeled after the SmolVLA structure
    (config + processor + backbone-with-expert; reference docstring :15-18)."""

    config_class = FastVLAConfig
    name = "fastvla"

    def __init__(self, config: FastVLAConfig | None = None) -> None:
        self.config = config or FastVLAConfig()
        self.model = FastVLMWithExpert(self.config)
        self.processor = FastVLAProcessor(self.config, self.model.backbone)
        self._jit_loss = jax.jit(self.loss_fn, static_argnames=("train",))

    # ------------------------------------------------------------------
    # parameters (delegated)

    @property
    def params(self) -> Dict:
        return self.model.params

    def load_params(self, params: Dict) -> None:
        self.model.load_params(params)

    def trainable_params(self) -> Dict:
        return self.model.trainable_params()

    def merge_trainable(self, trainable: Dict) -> Dict:
        return self.model.merge_trainable(trainable)

    # ------------------------------------------------------------------
    # host-side batch prep

    def prepare_batch(self, batch: Dict) -> Dict[str, np.ndarray]:
        """Collated batch (images/states/actions/tasks) -> static arrays."""
        images = self.processor.prepare_images(batch["images"])
        states = self.processor.prepare_states(batch["states"])
        tasks = self.processor.prepare_tasks(batch["tasks"], batch_size=images.shape[0])
        ids, mask = self.model.backbone._prep_text(tasks)
        out = {
            "images": images,
            "states": states,
            "input_ids": ids,
            "attention_mask": mask,
        }
        if "actions" in batch:
            actions = np.asarray(batch["actions"], dtype=np.float32)
            if self.config.chunk_size == 1 and actions.ndim == 3:
                actions = actions[:, 0]
            out["actions"] = actions
        return out

    # ------------------------------------------------------------------
    # pure compute

    def loss_fn(
        self,
        trainable: Dict,
        frozen: Dict,
        arrays: Dict[str, jnp.ndarray],
        dropout_rng: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """MSE loss over predicted vs target actions, jit/grad-compatible.

        ``trainable``/``frozen`` split lets ``jax.grad`` differentiate only the
        optimized sub-tree; together they form the full parameter pytree.
        """
        params = {**frozen, **trainable}
        preds = self.model.apply_fn(
            params,
            arrays["images"],
            arrays["input_ids"],
            arrays["attention_mask"],
            arrays["states"],
            dropout_rng=dropout_rng,
            train=train,
        )
        mse = jnp.mean(jnp.square(preds - arrays["actions"].astype(preds.dtype)))
        return mse, {"loss": mse, "mse": mse}

    def frozen_params(self) -> Dict:
        full = self.params
        trainable = self.trainable_params()
        return {k: v for k, v in full.items() if k not in trainable}

    # ------------------------------------------------------------------
    # reference-parity API

    def forward(
        self,
        images,
        states,
        tasks: List[str] | str,
        device: Optional[jax.Device] = None,
    ) -> jax.Array:
        """Compute actions for a batch of observations."""
        images = self.processor.prepare_images(images, device)
        states = self.processor.prepare_states(states, device)
        tasks = self.processor.prepare_tasks(tasks, batch_size=images.shape[0])
        return self.model.forward(images, states, tasks, device=device)

    def compute_loss(self, batch: Dict) -> Dict[str, jax.Array]:
        """Regression MSE loss between predicted actions and targets."""
        arrays = self.prepare_batch(batch)
        mse, metrics = self._jit_loss(
            self.trainable_params(), self.frozen_params(), arrays
        )
        return metrics

    def select_action(
        self,
        image,
        state,
        task: str,
        device: Optional[jax.Device] = None,
    ) -> jax.Array:
        """Produce a single action for inference scenarios."""
        image_batch = np.asarray(image, dtype=np.float32)[None]
        state_batch = np.asarray(state, dtype=np.float32)[None]
        tasks = self.processor.prepare_tasks(task, batch_size=1)
        action = self.forward(image_batch, state_batch, tasks, device=device)
        return action[0]

    def reset(self) -> None:
        """Included for API compatibility (reference :74-77)."""
        return
