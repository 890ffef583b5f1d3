"""dynamic_video_depth_tpu — a TPU-native (JAX/XLA/Pallas) framework for
consistent depth of moving objects in video.

A ground-up rebuild of the capabilities of google/dynamic-video-depth
(SIGGRAPH 2021 test-time optimization pipeline) designed for TPU hardware:

- pure-functional geometry ops (``ops``) with exact parity to the reference's
  camera conventions (reference: losses/scene_flow_projection.py),
- Flax network definitions (``models``) for the MiDaS ResNeXt101-WSL depth
  net, the MannequinChallenge hourglass, and the scene-flow field MLP,
- a single fused, jit-compiled optimization step (``train``) replacing the
  reference's two-backward PyTorch loop,
- multi-video scaling over a ``jax.sharding.Mesh`` (``parallel``),
- a thin imperative runtime shell (``runtime``) for config, checkpointing,
  logging and visualization.

Data layout conventions (TPU-first, differs from the torch reference):
- images / feature maps are channel-last ``[B, H, W, C]``,
- depth is ``[B, H, W]``, flow is ``[B, H, W, 2]`` with ``(dx, dy)``,
- camera poses are plain (untransposed) matrices in a ``Camera`` pytree;
  the packed row-vector/transposed format of the reference's datafiles is
  converted at the data boundary (see ``data``).
"""

__version__ = "0.1.0"
