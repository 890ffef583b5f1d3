"""Colored stage banners + seeding (reference: util/util_print.py:17-30,
util/util_loadlib.py:64-78)."""

from __future__ import annotations

import random

import numpy as np

_CYAN = "\033[96m"
_BOLD = "\033[1m"
_END = "\033[0m"


def str_stage(msg: str) -> str:
    return f"{_BOLD}{_CYAN}==>{_END} {msg}"


def print_stage(msg: str):
    print(str_stage(msg))


def set_manual_seed(seed: int):
    """Seed python/numpy host-side RNGs (jax PRNG keys are derived
    explicitly from the seed at init sites)."""
    random.seed(seed)
    np.random.seed(seed)
