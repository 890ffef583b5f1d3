"""Mesh construction helpers."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[Tuple[str, int]], devices=None) -> Mesh:
    """Build a mesh from (name, size) axes over the given (or all) devices.

    Example: ``make_mesh([('video', 4), ('data', 2)])`` on 8 chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    names = [n for n, _ in axes]
    sizes = [s for _, s in axes]
    need = int(np.prod(sizes))
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(sizes)
    return Mesh(arr, names)


def video_sharding(mesh: Mesh, axis: str = "video") -> NamedSharding:
    """Leading-axis sharding: one slice per device along ``axis``."""
    return NamedSharding(mesh, P(axis))


def batch_sharding(mesh: Mesh, video_axis: str = "video",
                   data_axis: str = "data") -> NamedSharding:
    """[V, B, ...] arrays: videos over one axis, batch over the other."""
    return NamedSharding(mesh, P(video_axis, data_axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
