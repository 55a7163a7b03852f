"""Device mesh construction and distributed init.

The reference's entire distributed story is HF Accelerate wrapping
torch.distributed DDP with NCCL collectives (reference ``trainer.py:55,68-78``,
SURVEY.md §2.3). The TPU-native equivalent: a ``jax.sharding.Mesh`` with
``data`` x ``model`` axes; GSPMD inserts all-reduce/all-gather over ICI from
sharding annotations — no hand-written collectives.

Axis convention:
- ``data``: batch-dimension parallelism (the reference's DP).
- ``model``: tensor parallelism for the Qwen2 decoder (needed for 7B on
  v5e-16GB chips, SURVEY.md §2.3 TP row).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    ``data=-1`` absorbs all devices not taken by ``model``. The device order
    respects JAX's default (ICI-contiguous) enumeration so the ``model`` axis
    — which carries the latency-critical TP collectives — maps to physically
    adjacent chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model <= 0:
        raise ValueError(f"model axis size must be positive, got {model}")
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model = {data * model} != {n} devices")
    mesh_devices = np.array(devices).reshape(data, model)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    device = device or jax.devices()[0]
    return Mesh(np.array([[device]]), (DATA_AXIS, MODEL_AXIS))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (the reference's accelerate-launch process-group role).

    No-op on a single host; on pods, ``jax.distributed.initialize`` wires the
    per-host runtimes (auto-detected on TPU pods when args are None).
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        # On single-host setups jax.distributed.initialize() without a
        # coordinator is unnecessary; jax.process_count() stays 1.
    except Exception as exc:  # pragma: no cover - environment dependent
        logger.warning("jax.distributed.initialize failed: %s", exc)
