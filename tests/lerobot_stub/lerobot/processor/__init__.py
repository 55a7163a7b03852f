"""Processor pipeline steps (mirrors lerobot.processor).

Steps operate on a flat batch dict (``observation.*`` keys, ``action``,
``task`` passthrough); pipelines optionally convert a bare action tensor
to/from that dict via the ``converters`` module, matching how the real
package routes policy outputs through the postprocessor.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Generic, List, Optional, TypeVar

import torch

from ..configs.types import NormalizationMode

PolicyAction = torch.Tensor

TIn = TypeVar("TIn")
TOut = TypeVar("TOut")

_EPS = 1e-8


def _is_image_key(key: str) -> bool:
    return "image" in key


@dataclasses.dataclass
class RenameObservationsProcessorStep:
    rename_map: Dict[str, str]

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        return {self.rename_map.get(key, key): value for key, value in batch.items()}


@dataclasses.dataclass
class AddBatchDimensionProcessorStep:
    """Unsqueeze unbatched tensors: images (C,H,W)->(1,C,H,W), vectors (D,)->(1,D)."""

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for key, value in batch.items():
            if isinstance(value, torch.Tensor):
                if _is_image_key(key) and value.dim() == 3:
                    value = value.unsqueeze(0)
                elif not _is_image_key(key) and value.dim() == 1:
                    value = value.unsqueeze(0)
            out[key] = value
        return out


@dataclasses.dataclass
class DeviceProcessorStep:
    device: str = "cpu"

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        return {
            key: value.to(self.device) if isinstance(value, torch.Tensor) else value
            for key, value in batch.items()
        }


def _stat(stats, key: str, name: str) -> Optional[torch.Tensor]:
    entry = (stats or {}).get(key)
    if entry is None or name not in entry:
        return None
    return torch.as_tensor(entry[name], dtype=torch.float32)


@dataclasses.dataclass
class NormalizerProcessorStep:
    features: Dict[str, Any]
    norm_map: Dict[str, NormalizationMode]
    stats: Optional[Dict[str, Dict[str, Any]]] = None
    device: str | None = None

    def _apply(self, key: str, feature, value: torch.Tensor) -> torch.Tensor:
        mode = self.norm_map.get(
            feature.type.value if hasattr(feature.type, "value") else feature.type,
            NormalizationMode.IDENTITY,
        )
        if mode is NormalizationMode.IDENTITY:
            return value
        if mode is NormalizationMode.MEAN_STD:
            mean, std = _stat(self.stats, key, "mean"), _stat(self.stats, key, "std")
            if mean is None or std is None:
                return value
            return (value - mean) / (std + _EPS)
        if mode is NormalizationMode.MIN_MAX:
            lo, hi = _stat(self.stats, key, "min"), _stat(self.stats, key, "max")
            if lo is None or hi is None:
                return value
            return 2.0 * (value - lo) / (hi - lo + _EPS) - 1.0
        raise ValueError(f"unknown normalization mode {mode}")

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        out = dict(batch)
        for key, feature in self.features.items():
            if key in out and isinstance(out[key], torch.Tensor):
                out[key] = self._apply(key, feature, out[key])
        return out


@dataclasses.dataclass
class UnnormalizerProcessorStep(NormalizerProcessorStep):
    def _apply(self, key: str, feature, value: torch.Tensor) -> torch.Tensor:
        mode = self.norm_map.get(
            feature.type.value if hasattr(feature.type, "value") else feature.type,
            NormalizationMode.IDENTITY,
        )
        if mode is NormalizationMode.IDENTITY:
            return value
        if mode is NormalizationMode.MEAN_STD:
            mean, std = _stat(self.stats, key, "mean"), _stat(self.stats, key, "std")
            if mean is None or std is None:
                return value
            return value * (std + _EPS) + mean
        if mode is NormalizationMode.MIN_MAX:
            lo, hi = _stat(self.stats, key, "min"), _stat(self.stats, key, "max")
            if lo is None or hi is None:
                return value
            return (value + 1.0) / 2.0 * (hi - lo + _EPS) + lo
        raise ValueError(f"unknown normalization mode {mode}")


class PolicyProcessorPipeline(Generic[TIn, TOut]):
    """Apply ``steps`` in order, with optional boundary converters."""

    def __init__(
        self,
        name: str,
        steps: List[Callable],
        to_transition: Optional[Callable] = None,
        to_output: Optional[Callable] = None,
    ) -> None:
        self.name = name
        self.steps = list(steps)
        self._to_transition = to_transition
        self._to_output = to_output

    def __call__(self, data: TIn) -> TOut:
        batch = self._to_transition(data) if self._to_transition else data
        for step in self.steps:
            batch = step(batch)
        return self._to_output(batch) if self._to_output else batch


__all__ = [
    "AddBatchDimensionProcessorStep",
    "DeviceProcessorStep",
    "NormalizerProcessorStep",
    "PolicyAction",
    "PolicyProcessorPipeline",
    "RenameObservationsProcessorStep",
    "UnnormalizerProcessorStep",
]
