"""Boundary converters (mirrors lerobot.processor.converters)."""

from __future__ import annotations

from typing import Any, Dict

import torch

from ..utils.constants import ACTION


def policy_action_to_transition(action: torch.Tensor) -> Dict[str, Any]:
    return {ACTION: action}


def transition_to_policy_action(transition: Dict[str, Any]) -> torch.Tensor:
    return transition[ACTION]
