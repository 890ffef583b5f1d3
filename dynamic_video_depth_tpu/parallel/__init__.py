"""Multi-chip scaling over a ``jax.sharding.Mesh``.

The reference's only parallelism is (broken) multi-GPU DDP
(reference: train.py:284-292, SURVEY §2.2). The TPU-native replacements:

- ``multi_video``: independent per-video optimizations sharded one-video-
  per-chip over a ``video`` mesh axis (what the reference's DDP *intended*),
- same-video data parallelism over a ``data`` axis: the pair batch is
  sharded, gradients all-reduce over ICI automatically through jit sharding
  propagation (the correct analog of DDP's NCCL all-reduce).
"""

from .mesh import make_mesh, video_sharding, replicate_sharding
from .multi_video import (
    DataParallelStep,
    MultiVideoDataParallel,
    MultiVideoOptimizer,
)

__all__ = [
    "make_mesh",
    "video_sharding",
    "replicate_sharding",
    "MultiVideoOptimizer",
    "MultiVideoDataParallel",
    "DataParallelStep",
]
