"""Mesh construction helpers."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host runtime init (replaces the reference's
    torch.distributed.init_process_group TCP rendezvous, train.py:138).

    On TPU pods the arguments are discovered from the environment; pass them
    explicitly only for CPU/GPU clusters. Safe to call once per process
    before any jax computation; no-op if already initialized.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


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
