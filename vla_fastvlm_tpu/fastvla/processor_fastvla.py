"""FastVLA processor: task/image/state preparation.

Parity with reference ``src/vla_fastvlm/fastvla/processor_fastvla.py:11-43``:
task broadcast + trailing newline, time-major squeeze (take the last step of
``(B, T, ...)``), image prep delegated to the backbone. Host-side work is
numpy; device work happens inside the backbone's jitted program.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from ..model.fastvlm_adapter import FastVLMBackbone
from .configuration_fastvla import FastVLAConfig


class FastVLAProcessor:
    """Mirrors the SmolVLA preparation flow (reference docstring :12-17)."""

    def __init__(self, config: FastVLAConfig, backbone: FastVLMBackbone) -> None:
        self.config = config
        self.backbone = backbone

    def normalize_tasks(self, tasks: List[str] | str, batch_size: int) -> List[str]:
        if isinstance(tasks, str):
            tasks = [tasks]
        tasks = list(tasks)
        if len(tasks) == 1 and batch_size > 1:
            tasks = [tasks[0] for _ in range(batch_size)]
        if self.config.add_trailing_newline:
            tasks = [task if task.endswith("\n") else f"{task}\n" for task in tasks]
        return tasks

    def prepare_images(self, images, device: Optional[jax.Device] = None) -> np.ndarray:
        images = np.asarray(images, dtype=np.float32)
        ncam = self.config.num_cameras
        if ncam > 1:
            # multi-camera layout: (B, ncam, C, H, W), time-major adds T in
            # front -> (B, T, ncam, C, H, W)
            if images.ndim == 6:
                images = images[:, -1]
        elif images.ndim == 5:  # (B, T, C, H, W): keep the latest step
            images = images[:, -1]
        return self.backbone._as_bchw(images)

    def prepare_states(self, states, device: Optional[jax.Device] = None) -> np.ndarray:
        states = np.asarray(states, dtype=np.float32)
        if states.ndim == 3:  # (B, T, D): keep the latest step
            states = states[:, -1]
        return states

    def prepare_tasks(self, tasks: List[str] | str, batch_size: int) -> List[str]:
        return self.normalize_tasks(tasks, batch_size)
