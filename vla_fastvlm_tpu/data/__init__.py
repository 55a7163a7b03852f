"""Data layer (L4). Parity with reference ``src/vla_fastvlm/data/__init__.py``."""

from .aloha_dataset import (
    AlohaDataset,
    AlohaIterableDataset,
    AlohaSample,
    DataLoader,
    SyntheticAlohaSource,
    aloha_collate_fn,
    create_aloha_dataloader,
    default_aloha_transforms,
)

__all__ = [
    "AlohaDataset",
    "AlohaIterableDataset",
    "AlohaSample",
    "DataLoader",
    "SyntheticAlohaSource",
    "aloha_collate_fn",
    "create_aloha_dataloader",
    "default_aloha_transforms",
]
