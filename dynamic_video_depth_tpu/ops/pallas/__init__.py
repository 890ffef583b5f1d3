"""Pallas TPU kernels for the hot ops.

- ``mlp_kernel``: fused scene-flow coordinate MLP (the dominant per-step
  cost: a 256-wide MLP evaluated per pixel, integrated over the frame gap
  and differentiated — unfused XLA spills ~88MB of activations to HBM per
  layer per eval; the fused kernel keeps the whole chain in VMEM).
- ``warp_kernel``: fused gather-free backward warp (the loss chain's
  grid-sample replaced by tent-weight MXU matmuls + VPU reductions), with
  a custom VJP w.r.t. the warped buffer.
- ``loss_kernel``: fused scene-flow projection + occlusion-masked loss
  reductions (advect, reproject, flow/disparity/scene-flow residuals) in
  one VMEM-resident pass with a custom VJP — together these run the whole
  loss graph between the depth CNN and the scalar losses in Pallas.
"""

from .correlation import fused_lookup_correlation
from .loss_kernel import fused_projection_loss, pack_camera
from .mlp_kernel import (
    chain_bwd_vmem_bytes,
    fused_mlp,
    fused_mlp_embed,
    fused_mlp_embed_chain,
    fused_mlp_reference,
    pick_chain_tile,
)
from .warp_kernel import fused_backward_warp

__all__ = [
    "chain_bwd_vmem_bytes",
    "pick_chain_tile",
    "fused_lookup_correlation",
    "fused_mlp",
    "fused_mlp_embed",
    "fused_mlp_embed_chain",
    "fused_mlp_reference",
    "fused_backward_warp",
    "fused_projection_loss",
    "pack_camera",
]
