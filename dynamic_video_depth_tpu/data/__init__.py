"""Data layer: readers for the reference's preprocessed datafiles
(reference: datasets/), a dataset registry, and device prefetch."""

import importlib


def get_dataset(alias: str):
    """Alias -> Dataset class (reference: datasets/__init__.py:18-20)."""
    module = importlib.import_module("dynamic_video_depth_tpu.data." + alias)
    return module.Dataset


from .base import BaseDataset  # noqa: E402
from .batches import (  # noqa: E402
    pair_batch_from_packed,
    frame_batch_from_npz,
    load_packed_pt,
)
from .prefetch import DevicePrefetcher, BatchLoader  # noqa: E402

__all__ = [
    "get_dataset",
    "BaseDataset",
    "pair_batch_from_packed",
    "frame_batch_from_npz",
    "load_packed_pt",
    "DevicePrefetcher",
    "BatchLoader",
]
