"""PreTrainedPolicy base (mirrors lerobot.policies.pretrained)."""

from __future__ import annotations

import torch
from torch import nn


class PreTrainedPolicy(nn.Module):
    """torch.nn.Module base the lerobot trainer drives.

    The real class adds hub push/pull; the trainer-facing contract the plugin
    implements is: ``__init__(config)``, ``get_optim_params``, ``reset``,
    ``forward(batch) -> (loss, dict)``, ``select_action``,
    ``predict_action_chunk``.
    """

    config_class = None
    name: str | None = None

    def __init__(self, config, **kwargs):
        super().__init__()
        if self.config_class is not None and not isinstance(config, self.config_class):
            raise TypeError(
                f"config must be a {self.config_class.__name__}, got {type(config)}"
            )
        self.config = config

    @torch.no_grad()
    def select_action(self, batch):  # pragma: no cover - overridden
        raise NotImplementedError

    def forward(self, batch):  # pragma: no cover - overridden
        raise NotImplementedError
