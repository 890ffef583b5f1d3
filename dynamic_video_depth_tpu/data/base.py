"""Dataset base class (reference: datasets/base_dataset.py:20-34).

Datasets are plain Python iterables yielding numpy batch dicts; device
placement and pipelining live in ``prefetch``. Each concrete dataset exposes
``add_arguments`` so the CLI can inject its flags, mirroring the reference's
two-phase argparse."""

from __future__ import annotations


class BaseDataset:
    @classmethod
    def add_arguments(cls, parser):
        return parser, set()

    def __init__(self, opt, mode="train", model=None):
        assert mode in ("train", "vali")
        self.opt = opt
        self.mode = mode
        self.model = model

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx):
        raise NotImplementedError
