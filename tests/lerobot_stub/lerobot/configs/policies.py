"""PreTrainedConfig base + choice registry (mirrors lerobot.configs.policies)."""

from __future__ import annotations

import dataclasses
from typing import ClassVar, Dict, Optional

from .types import FeatureType, PolicyFeature


@dataclasses.dataclass
class PreTrainedConfig:
    """Draccus-style registered policy config base.

    Carries the feature maps lerobot-train fills from the dataset plus the
    device knob the processor pipelines consume.
    """

    input_features: Dict[str, PolicyFeature] = dataclasses.field(default_factory=dict)
    output_features: Dict[str, PolicyFeature] = dataclasses.field(default_factory=dict)
    device: str = "cpu"
    use_amp: bool = False
    push_to_hub: bool = False

    _REGISTRY: ClassVar[Dict[str, type]] = {}

    def __post_init__(self):
        pass

    @classmethod
    def register_subclass(cls, name: str):
        def decorator(subclass: type) -> type:
            PreTrainedConfig._REGISTRY[name] = subclass
            subclass.type = name
            return subclass

        return decorator

    @classmethod
    def get_choice_class(cls, name: str) -> type:
        return PreTrainedConfig._REGISTRY[name]

    @property
    def robot_state_feature(self) -> Optional[PolicyFeature]:
        for ft in self.input_features.values():
            if ft.type is FeatureType.STATE:
                return ft
        return None

    @property
    def image_features(self) -> Dict[str, PolicyFeature]:
        return {
            key: ft
            for key, ft in self.input_features.items()
            if ft.type is FeatureType.VISUAL
        }

    @property
    def action_feature(self) -> Optional[PolicyFeature]:
        for ft in self.output_features.values():
            if ft.type is FeatureType.ACTION:
                return ft
        return None
