"""Middlebury ``.flo`` optical-flow file I/O (reference:
util/util_flow.py:22-73 ``readFlow``/``writeFlow``).

The internal pipeline stores flows in packed ``.npz``/``.pt`` batches, but
externally produced flow files (RAFT reference outputs, Sintel ground
truth) ship in the Middlebury format: float32 magic 202021.25, int32 width,
int32 height, then ``h*w*2`` float32 values interleaved (u, v) row-major.
Little-endian, like the reference's reader.
"""

from __future__ import annotations

import numpy as np

_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Read a ``.flo`` file -> ``[H, W, 2]`` float32 (u, v).

    Raises ``ValueError`` on a bad magic number (the reference prints and
    returns None; an exception is strictly more debuggable).
    """
    with open(path, "rb") as f:
        magic = np.fromfile(f, "<f4", count=1)
        if magic.size != 1 or magic[0] != _MAGIC:
            raise ValueError(f"{path}: invalid .flo magic {magic!r}")
        w = int(np.fromfile(f, "<i4", count=1)[0])
        h = int(np.fromfile(f, "<i4", count=1)[0])
        data = np.fromfile(f, "<f4", count=2 * w * h)
        if data.size != 2 * w * h:
            raise ValueError(f"{path}: truncated .flo ({data.size} values)")
        return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    """Write ``flow [H, W, 2]`` float32 (u, v) as a ``.flo`` file."""
    flow = np.asarray(flow, np.float32)
    if flow.ndim != 3 or flow.shape[2] != 2:
        raise ValueError(f"flow must be [H, W, 2], got {flow.shape}")
    h, w, _ = flow.shape
    with open(path, "wb") as f:
        np.asarray([_MAGIC], "<f4").tofile(f)
        np.asarray([w], "<i4").tofile(f)
        np.asarray([h], "<i4").tofile(f)
        flow.astype("<f4").tofile(f)
