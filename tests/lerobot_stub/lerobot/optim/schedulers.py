"""Scheduler preset dataclasses (mirrors lerobot.optim.schedulers)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class CosineDecayWithWarmupSchedulerConfig:
    peak_lr: float
    decay_lr: float
    num_warmup_steps: int
    num_decay_steps: int
