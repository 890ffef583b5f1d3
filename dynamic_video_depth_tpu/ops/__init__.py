"""Geometry / warping ops.

Pure-JAX, stateless re-derivations of the reference's geometry modules
(reference: losses/scene_flow_projection.py). All functions operate on
channel-last tensors and plain (untransposed) camera matrices.
"""

from .camera import Camera, camera_from_packed, packed_from_camera
from .grid_sample import grid_sample, backward_warp
from .coords import pixel_coords
from .geometry import (
    unproject,
    project,
    flow_by_depth,
    scene_flow_projection,
    depth_warp_stage,
    projection_stage,
    rigidity_loss,
)

__all__ = [
    "Camera",
    "camera_from_packed",
    "packed_from_camera",
    "grid_sample",
    "backward_warp",
    "pixel_coords",
    "unproject",
    "project",
    "flow_by_depth",
    "scene_flow_projection",
    "depth_warp_stage",
    "projection_stage",
    "rigidity_loss",
]
