"""Import a reference TRAINING checkpoint mid-run.

The reference saves ``checkpoint.pt`` / ``best.pt`` / ``nets/%04d.pt`` as
``{'nets': [net_depth_sd, net_sceneflow_sd], 'optimizers': [adam_depth_sd,
adam_scene_sd], 'epoch': N, ...}`` (reference: models/netinterface.py:
528-536 ``save_state_dict``, nets/optimizers order
models/scene_flow_motion_field.py:112-115). This module loads that format
into a :class:`~..train.step.TrainState` — network weights AND BatchNorm
running stats through the mechanical torch port, and the Adam first/second
moments + step count into the optax state — so a user of the reference can
switch to this framework in the middle of a per-video optimization and the
very next update step matches what torch would have produced
(tests/test_migrate.py pins one-step continuation parity).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_BUFFER_MARKERS = ("running_mean", "running_var", "num_batches_tracked")


def _to_numpy_tree(obj):
    import torch

    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: _to_numpy_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy_tree(v) for v in obj)
    return obj


def load_reference_checkpoint(path: str) -> Dict:
    """torch.load the reference's nested checkpoint dict -> numpy leaves."""
    import torch

    return _to_numpy_tree(torch.load(path, map_location="cpu",
                                     weights_only=False))


def _param_keys_in_order(sd: Dict[str, np.ndarray]):
    """Torch ``net.parameters()`` order from a state dict: state_dict yields
    each submodule's _parameters before its _buffers in registration order,
    so filtering out buffer keys preserves the parameter order — which is
    exactly the Adam param-id order (ids enumerate ``net.parameters()``)."""
    return [k for k in sd if not any(m in k for m in _BUFFER_MARKERS)]


def _port_moment_tree(params_template, sd_keys, opt_state_sd, field: str):
    """Torch per-param-id Adam moments -> a pytree shaped like our params.

    ``opt_state_sd``: the torch optimizer state dict (``state`` keyed by
    param id, ``param_groups[0]['params']`` listing the ids in order).
    Moments pass through the same layout transforms as the weights
    (conv OIHW -> HWIO etc.) via :func:`port_torch_variables`.
    """
    import jax
    import jax.numpy as jnp

    from ..models.torch_port import port_torch_variables

    # zero template: params whose moments torch never materialized (never
    # updated) must come through as zeros, not as the weight values
    params_template = jax.tree.map(jnp.zeros_like, params_template)

    ids = []
    for group in opt_state_sd["param_groups"]:
        ids.extend(group["params"])
    assert len(ids) == len(sd_keys), (
        f"optimizer tracks {len(ids)} params, net has {len(sd_keys)}"
    )
    state = opt_state_sd.get("state", {})
    fake_sd = {}
    for pid, key in zip(ids, sd_keys):
        entry = state.get(pid, state.get(str(pid)))
        if entry is None:
            continue  # param never updated: leave the optax zeros
        fake_sd[key] = np.asarray(entry[field])
    ported = port_torch_variables({"params": params_template}, fake_sd,
                                  strict=False)
    return ported["params"]


def _torch_step_count(opt_state_sd) -> int:
    steps = [int(np.asarray(e["step"]))
             for e in opt_state_sd.get("state", {}).values()]
    return max(steps) if steps else 0


def _import_adam_state(opt_state, params, sd, opt_state_sd):
    """Replace the ScaleByAdamState inside an optax chain state with the
    torch moments (count drives bias correction — it must carry over)."""
    import jax.numpy as jnp
    import optax

    keys = _param_keys_in_order(sd)
    mu = _port_moment_tree(params, keys, opt_state_sd, "exp_avg")
    nu = _port_moment_tree(params, keys, opt_state_sd, "exp_avg_sq")
    count = jnp.asarray(_torch_step_count(opt_state_sd), jnp.int32)

    def replace(entry):
        if isinstance(entry, optax.ScaleByAdamState):
            return entry._replace(count=count, mu=mu, nu=nu)
        return entry

    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(replace(e) for e in opt_state)
    return replace(opt_state)


def import_reference_checkpoint(path: str, step, state,
                                load_optimizer: str | bool = "auto"
                                ) -> Tuple[object, Dict]:
    """Load a reference training checkpoint into a TrainState.

    Args:
      path: the reference ``checkpoint.pt`` (or ``best.pt``/``nets/*.pt``).
      step: the :class:`SceneFlowMotionFieldStep` (for optimizer configs).
      state: the freshly-initialized TrainState to overwrite.
      load_optimizer: 'auto' (when present, like the reference's
        load_state_dict), True, or False.
    Returns:
      (new_state, extras) — extras carries 'epoch'/'loss_eval' when saved.
    """
    from ..models.torch_port import port_torch_variables

    ckpt = load_reference_checkpoint(path)
    nets = ckpt["nets"]
    assert len(nets) == 2, f"expected [net_depth, net_sceneflow], got {len(nets)}"
    depth_sd, sf_sd = nets[0], nets[1]

    depth_vars = {"params": state.params_depth}
    if state.stats_depth:
        depth_vars["batch_stats"] = state.stats_depth
    depth_vars = port_torch_variables(depth_vars, depth_sd)
    sf_vars = port_torch_variables({"params": state.params_sf}, sf_sd)

    new_state = state.replace(
        params_depth=depth_vars["params"],
        params_sf=sf_vars["params"],
        stats_depth=depth_vars.get("batch_stats", state.stats_depth),
    )

    if load_optimizer == "auto":
        load_optimizer = "optimizers" in ckpt
        if not load_optimizer:
            print("Warning: reference checkpoint has no optimizer states.")
    if load_optimizer:
        assert step.cfg.optim == "adam", (
            "optimizer-state import implemented for adam (the reference's "
            "canonical optimizer); pass load_optimizer=False for sgd"
        )
        opts = ckpt["optimizers"]
        new_state = new_state.replace(
            opt_depth=_import_adam_state(
                state.opt_depth, new_state.params_depth, depth_sd, opts[0]),
            opt_sf=_import_adam_state(
                state.opt_sf, new_state.params_sf, sf_sd, opts[1]),
        )

    extras = {k: v for k, v in ckpt.items() if k not in ("nets", "optimizers")}
    return new_state, extras


# --------------------------------------------------------------------- export

def _deconvert(value: np.ndarray, kind: str, torch_shape) -> np.ndarray:
    """Inverse of models.torch_port._convert: flax layout -> torch layout."""
    value = np.asarray(value)
    if kind == "kernel":
        if len(torch_shape) == 4:
            if value.ndim == 2:  # flax Dense <- torch 1x1 conv
                value = value[None, None]  # [1, 1, I, O]
            value = value.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif len(torch_shape) == 2 and value.ndim == 2:
            value = value.transpose(1, 0)  # IO -> OI
    if tuple(value.shape) != tuple(torch_shape):
        raise ValueError(
            f"Shape mismatch exporting {kind}: flax {value.shape} vs "
            f"torch {tuple(torch_shape)}"
        )
    return value


def _flax_to_torch_sd(variables, template_sd):
    """Flax variables -> torch state dict with the template's layout.
    Template keys we do not own (e.g. the hourglass's unused
    uncertainty_layer, num_batches_tracked counters) keep their template
    values."""
    from flax import traverse_util
    from flax.core import unfreeze

    from ..models.torch_port import _torch_key

    out = dict(template_sd)
    for collection, tree in variables.items():
        for path, leaf in traverse_util.flatten_dict(unfreeze(tree)).items():
            key, kind = _torch_key(path)
            if key in template_sd:
                out[key] = _deconvert(
                    np.asarray(leaf), kind, np.asarray(template_sd[key]).shape
                )
    return out


def _owned_torch_keys(variables):
    """Torch keys this framework's variable tree models."""
    from flax import traverse_util
    from flax.core import unfreeze

    from ..models.torch_port import _torch_key

    keys = set()
    for collection, tree in variables.items():
        for path in traverse_util.flatten_dict(unfreeze(tree)):
            keys.add(_torch_key(path)[0])
    return keys


def _export_adam_state(opt_state, variables, sd_template, opt_template):
    """optax ScaleByAdamState -> torch Adam state dict (template layout).

    Moments are written only for params this framework models; params we do
    not own (e.g. the hourglass's unused uncertainty_layer) keep their
    template entry when one exists and stay absent otherwise — matching
    torch's never-updated semantics."""
    import optax

    entries = (opt_state if isinstance(opt_state, tuple) else (opt_state,))
    adams = [e for e in entries if isinstance(e, optax.ScaleByAdamState)]
    assert adams, (
        "optimizer-state export implemented for adam (the reference's "
        "canonical optimizer); export with a template without 'optimizers' "
        "for sgd-trained states"
    )
    adam = adams[0]
    count = int(np.asarray(adam.count))
    mu_sd = _flax_to_torch_sd({"params": adam.mu}, sd_template)
    nu_sd = _flax_to_torch_sd({"params": adam.nu}, sd_template)
    owned = _owned_torch_keys(variables)
    keys = _param_keys_in_order(sd_template)
    out = {"state": {}, "param_groups": []}
    for group in opt_template["param_groups"]:
        g = dict(group)
        out["param_groups"].append(g)
    old_state = opt_template.get("state", {})
    ids = []
    for group in opt_template["param_groups"]:
        ids.extend(group["params"])
    assert len(ids) == len(keys), (
        f"template optimizer tracks {len(ids)} params, its net has "
        f"{len(keys)} — id/key alignment would misattach moments"
    )
    for pid, key in zip(ids, keys):
        old = old_state.get(pid, old_state.get(str(pid)))
        if key in owned:
            entry = dict(old or {})
            entry["step"] = count
            entry["exp_avg"] = np.asarray(mu_sd[key])
            entry["exp_avg_sq"] = np.asarray(nu_sd[key])
            out["state"][pid] = entry
        elif old is not None:
            out["state"][pid] = dict(old)
    return out


def export_reference_checkpoint(state, template_path: str, out_path: str,
                                extras: Dict | None = None) -> None:
    """Write a TrainState as a reference-format training checkpoint.

    ``template_path``: an existing reference checkpoint of the SAME
    architecture (e.g. the one originally imported) — it disambiguates
    torch layouts (1x1 conv vs linear) and carries keys this framework
    does not model (unused layers, BN batch counters). The result loads
    through the reference's ``load_state_dict`` (and its raw modules'
    ``load_state_dict(strict=True)``).
    """
    import torch

    template = load_reference_checkpoint(template_path)
    depth_tmpl, sf_tmpl = template["nets"]

    depth_vars = {"params": state.params_depth}
    if state.stats_depth:
        depth_vars["batch_stats"] = state.stats_depth
    nets = [
        _flax_to_torch_sd(depth_vars, depth_tmpl),
        _flax_to_torch_sd({"params": state.params_sf}, sf_tmpl),
    ]
    ckpt = {"nets": [
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
        for sd in nets
    ]}
    if "optimizers" in template:
        opts = [
            _export_adam_state(state.opt_depth, depth_vars, depth_tmpl,
                               template["optimizers"][0]),
            _export_adam_state(state.opt_sf, {"params": state.params_sf},
                               sf_tmpl, template["optimizers"][1]),
        ]
        for o in opts:
            for entry in o["state"].values():
                for f in ("exp_avg", "exp_avg_sq"):
                    entry[f] = torch.from_numpy(
                        np.ascontiguousarray(entry[f]))
                entry["step"] = torch.tensor(float(entry["step"]))
        ckpt["optimizers"] = opts
    for k, v in (extras or {}).items():
        ckpt[k] = v
    torch.save(ckpt, out_path)
