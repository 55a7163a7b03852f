"""Feature/normalization types (mirrors lerobot.configs.types)."""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple


class FeatureType(str, enum.Enum):
    STATE = "STATE"
    VISUAL = "VISUAL"
    ENV = "ENV"
    ACTION = "ACTION"


class NormalizationMode(str, enum.Enum):
    MIN_MAX = "MIN_MAX"
    MEAN_STD = "MEAN_STD"
    IDENTITY = "IDENTITY"


@dataclasses.dataclass
class PolicyFeature:
    type: FeatureType
    shape: Tuple[int, ...]
