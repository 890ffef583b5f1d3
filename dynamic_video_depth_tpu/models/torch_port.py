"""Generic torch-checkpoint -> Flax-variables porter.

The pretrained artifacts the pipeline must accept are torch state dicts
(reference: configs/__init__.py:15-16 — ``midas_cpkt.pt`` and
``best_depth_Ours_Bilinear_inc_3_net_G.pth``). Our Flax modules name their
submodules after the torch key paths with ``.`` replaced by ``__``
(see models/midas.py, models/hourglass.py), which makes the port a mechanical
path translation:

  flax path ('pretrained__layer1__4__0', 'conv1', 'kernel')
    -> torch key 'pretrained.layer1.4.0.conv1.weight'

Leaf translation rules:
  params/kernel   <- weight   (conv OIHW -> HWIO; linear OI -> IO)
  params/scale    <- weight   (batch norm)
  params/bias     <- bias
  batch_stats/mean <- running_mean, batch_stats/var <- running_var

This file deliberately has no torch import at module level: loading is
delegated to ``load_torch_state_dict`` which imports torch lazily (CPU torch
is only needed when actually porting a checkpoint).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp
from flax import traverse_util
from flax.core import unfreeze


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a flat {key: numpy array} dict.

    Accepts raw state dicts and the MiDaS ``{"model": ...}`` wrapper
    (reference: third_party/MiDaS.py:36-41).
    """
    import torch  # local import: torch only needed at port time

    state = torch.load(path, map_location="cpu", weights_only=True)
    if "optimizer" in state and "model" in state:
        state = state["model"]
    if "state_dict" in state and isinstance(state["state_dict"], dict):
        state = state["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def _torch_key(flax_path: tuple) -> tuple:
    """Translate a flax variable path to (torch key, kind)."""
    *mods, leaf = flax_path
    prefix = ".".join(mods).replace("__", ".")
    if leaf == "kernel":
        return f"{prefix}.weight", "kernel"
    if leaf == "scale":
        return f"{prefix}.weight", "vector"
    if leaf == "bias":
        return f"{prefix}.bias", "bias"
    if leaf == "mean":
        return f"{prefix}.running_mean", "vector"
    if leaf == "var":
        return f"{prefix}.running_var", "vector"
    raise KeyError(f"Unknown flax leaf {leaf!r} at {flax_path}")


def _convert(value: np.ndarray, kind: str, target_shape) -> np.ndarray:
    if kind == "kernel":
        if value.ndim == 4:  # conv OIHW -> HWIO
            value = value.transpose(2, 3, 1, 0)
            if len(target_shape) == 2 and value.shape[:2] == (1, 1):
                value = value[0, 0]  # torch 1x1 conv -> flax Dense
        elif value.ndim == 2:  # linear OI -> IO
            value = value.transpose(1, 0)
    if tuple(value.shape) != tuple(target_shape):
        raise ValueError(
            f"Shape mismatch porting {kind}: torch {value.shape} vs "
            f"flax {tuple(target_shape)}"
        )
    return value


def port_torch_variables(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray],
    prefix: str = "",
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a Flax variable tree (from ``module.init``) with torch weights.

    Args:
      variables: ``{'params': ..., 'batch_stats': ...}`` from ``init``.
      state_dict: flat torch state dict (numpy values).
      prefix: optional torch key prefix to prepend (e.g. ``'net_depth.'``).
      strict: if True, every flax leaf must find its torch weight.

    Returns:
      A new variable dict of the same structure with ported weights.
    """
    out = {}
    used = set()
    for collection, tree in variables.items():
        flat = traverse_util.flatten_dict(unfreeze(tree))
        new_flat = {}
        for path, leaf in flat.items():
            key, kind = _torch_key(path)
            key = prefix + key
            if key in state_dict:
                new_flat[path] = jnp.asarray(
                    _convert(np.asarray(state_dict[key]), kind, leaf.shape),
                    dtype=leaf.dtype,
                )
                used.add(key)
            elif strict:
                raise KeyError(f"torch checkpoint missing key {key!r} for {path}")
            else:
                new_flat[path] = leaf
        out[collection] = traverse_util.unflatten_dict(new_flat)
    return out


def unused_torch_keys(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray],
    prefix: str = "",
):
    """Report torch keys that no flax leaf consumed (sanity check)."""
    used = set()
    for collection, tree in variables.items():
        for path in traverse_util.flatten_dict(unfreeze(tree)):
            key, _ = _torch_key(path)
            used.add(prefix + key)
    return sorted(k for k in state_dict if k not in used)
