"""Flax network definitions + model registry.

Mirrors the reference's alias registry (reference: models/__init__.py:18-20,
networks/, third_party/) with TPU-idiomatic channel-last Flax modules.
"""

import importlib


def get_model(alias: str):
    """String alias -> trainer Model class (reference: models/__init__.py:18-20)."""
    module = importlib.import_module(
        "dynamic_video_depth_tpu.train." + alias
    )
    return module.Model


from .blocks import PeriodicEmbed, ConvBlock, DoubleConvBlock  # noqa: E402
from .sceneflow_field import SceneFlowFieldNet  # noqa: E402
from .mlp import MLP, EmbeddedMLP  # noqa: E402
from .fcn_unet import FCNUnet  # noqa: E402
from .midas import MidasNet  # noqa: E402
from .hourglass import HourglassModel, HourglassModelEmbed  # noqa: E402

__all__ = [
    "get_model",
    "PeriodicEmbed",
    "ConvBlock",
    "DoubleConvBlock",
    "SceneFlowFieldNet",
    "MLP",
    "EmbeddedMLP",
    "FCNUnet",
    "MidasNet",
    "HourglassModel",
    "HourglassModelEmbed",
]
