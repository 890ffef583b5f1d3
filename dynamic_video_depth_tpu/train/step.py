"""The fused per-video optimization step.

Replaces the reference's imperative hot loop (reference:
models/scene_flow_motion_field.py:152-227 ``_train_on_batch``) with one
jit-compiled function: two depth-net forwards, depth-induced flow, K-step
Euler integration of the scene-flow field, scene-flow reprojection, the full
loss set *and* the acceleration regularizer in a single backward (the
reference's two ``backward()`` calls accumulate into the same ``.grad``
buffers before ``optimizer.step()`` — summing the losses is gradient-
equivalent), plus both Adam updates. No host synchronization per step: logs
stay on device and are fetched asynchronously by the caller.

Static specialization: ``steps`` (the frame gap) and ``warm`` (warm-up
phase) are compile-time constants — 5 gap buckets x 2 phases = at most 10
compilations per video fleet, amortized over the 40k-step schedule.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import (
    FCNUnet,
    HourglassModelEmbed,
    MidasNet,
    SceneFlowFieldNet,
)
from ..ops import (
    Camera,
    depth_warp_stage,
    projection_stage,
    unproject,
)
from .losses import LossConfig, consistency_losses, disparity_vali_loss


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    """Net + optimization hyperparameters (reference flags:
    options/options_train.py:84-90, models/scene_flow_motion_field.py:33-67).
    """

    # optimizer (reference: options/options_train.py:84-97)
    optim: str = "adam"
    lr: float = 1e-6
    scene_lr_mul: float = 1.0
    adam_beta1: float = 0.5
    adam_beta2: float = 0.9
    sgd_momentum: float = 0.9
    sgd_dampening: float = 0.0
    wdecay: float = 0.0
    # nets
    midas: bool = True
    depth_net: str = ""  # '' -> midas flag decides; 'tiny' for tests
    use_cnn: bool = False
    use_embedding: bool = False
    time_dependent: bool = True
    n_freq_xyz: int = 16
    n_freq_t: int = 16
    n_down: int = 3
    net_width: int = 256
    n_layers: int = 4
    # scene-flow net weight init (reference: init_weight kaiming(0.01, a=0.2),
    # models/scene_flow_motion_field.py:123 + netinterface.py:55-84)
    init_type: str = "kaiming"
    init_param: float = 0.01
    midas_resize: Optional[Tuple[int, int]] = None
    # losses
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    use_motion_seg: bool = False
    # numerics: bf16 conv compute for the depth nets (params stay f32)
    compute_dtype: str = "bfloat16"
    # densify ResNeXt grouped convs whose per-group width is <= this
    # (block-diagonal dense kernel; exact, trades `groups`x model FLOPs for
    # dense-conv MXU rates — see models/midas.py _DenseGroupedConv)
    dense_group_width: int = 16
    # for wider groups, merge adjacent groups into >=this-many-lane dense
    # blocks (0 = keep grouped)
    merge_group_width: int = 128
    # hourglass: s2d-densify narrow full/half-res inception branch convs on
    # feature maps of >= this many pixels (0 = off; models/hourglass.py
    # _branch_conv + ops/s2d.py — the spatial analog of dense_group_width).
    # The MiDaS decoder head's 128->32 conv measured SLOWER under the same
    # trick (see models/midas.py dead-end note).
    s2d_min_pixels: int = 16384
    # hourglass: compute each inception's four parallel 1x1 reducer convs
    # (+ affine-free BNs + relu) as ONE concatenated conv + one elementwise
    # stage (exact; models/hourglass.py Inception)
    merge_reducers: bool = True
    # rematerialize the depth-net forward in the backward pass: trades ~1/3
    # more FLOPs for O(activations) less HBM — enables resolutions well past
    # the reference's <=384-wide protocol on a single chip
    remat_depth: bool = False
    # fused Pallas scene-flow MLP ('auto' = on TPU backends only)
    use_pallas_sf: str = "auto"
    # Euler-chain megakernel: run the WHOLE multi-step scene-flow
    # integration (plus the acceleration regularizer's second field query)
    # as ONE Pallas kernel instead of one fwd+VJP launch pair per Euler
    # step ('auto' = whenever the fused MLP is on and the chain has >= 2
    # evaluations; see ops/pallas/mlp_kernel.py::fused_mlp_embed_chain)
    use_pallas_sf_chain: str = "auto"
    # fused Pallas backward warp ('auto' = on TPU backends only)
    use_pallas_warp: str = "auto"
    # fused Pallas projection+loss reductions ('auto' = on TPU backends AND
    # the frame is large enough that HBM residency beats per-op overhead —
    # see _PALLAS_LOSS_AUTO_MIN_PIXELS; 'on'/'off' force either path)
    use_pallas_loss: str = "auto"
    # source-row window of the fused warp; None = full height (always
    # exact), 64 covers any flow that varies < 48 px vertically within an
    # 8-row block (far beyond DAVIS working-resolution flows)
    pallas_warp_window: Optional[int] = 64
    # gradient observability: add global grad norms / max-abs per net to the
    # step logs (device scalars, ride the packed async fetch — zero extra
    # host syncs). The functional analog of the reference's grad-hook debug
    # utilities (reference: models/netinterface.py:362-411).
    log_grad_stats: bool = False


def _trace_with_dampening(decay: float, dampening: float):
    """Momentum trace with torch SGD dampening semantics
    (reference passes --sgd_dampening through to torch.optim.SGD,
    models/netinterface.py:132): the buffer seeds with the RAW first
    gradient, then follows ``buf = decay*buf + (1-dampening)*g``.
    optax.trace has no dampening knob, hence this transform."""

    def init_fn(params):
        return {
            "trace": jax.tree.map(jnp.zeros_like, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update_fn(updates, state, params=None):
        del params
        first = state["count"] == 0
        new_trace = jax.tree.map(
            lambda g, t: jnp.where(first, g,
                                   decay * t + (1.0 - dampening) * g),
            updates, state["trace"],
        )
        return new_trace, {"trace": new_trace, "count": state["count"] + 1}

    return optax.GradientTransformation(init_fn, update_fn)


class TrainState(struct.PyTreeNode):
    params_depth: Any
    params_sf: Any
    stats_depth: Any  # frozen BN running stats (never updated: nets run eval)
    opt_depth: Any
    opt_sf: Any
    step: jnp.ndarray


def _batch_cameras(batch: Dict[str, jnp.ndarray]) -> Tuple[Camera, Camera]:
    cam_1 = Camera(batch["R_1"], batch["t_1"], batch["K"], batch["K_inv"])
    cam_2 = Camera(batch["R_2"], batch["t_2"], batch["K"], batch["K_inv"])
    return cam_1, cam_2


class SceneFlowMotionFieldStep:
    """Builds the nets and exposes jitted train/vali/test step functions.

    This is the functional core; the stateful trainer shell lives in
    ``runtime`` and ``train.loop``.
    """

    def __init__(self, cfg: TrainStepConfig):
        self.cfg = cfg
        # depth_net is self-checking: '' defers to the midas flag (the
        # reference's --midas switch, models/scene_flow_motion_field.py:94-97);
        # explicit names select the net directly so a typo fails loudly
        # instead of silently falling through to the hourglass.
        valid = ("", "tiny", "midas", "hourglass")
        if cfg.depth_net not in valid:
            raise ValueError(
                f"depth_net={cfg.depth_net!r} not in {valid}")
        use_midas = (cfg.depth_net == "midas"
                     or (cfg.depth_net == "" and cfg.midas))
        if cfg.depth_net == "tiny":
            from ..models.tiny import TinyDepthNet

            self.net_depth = TinyDepthNet()
        elif use_midas:
            self.net_depth = MidasNet(
                non_negative=True, normalize_input=True,
                resize=cfg.midas_resize,
                dense_group_width=cfg.dense_group_width,
                merge_group_width=cfg.merge_group_width,
            )
        else:
            self.net_depth = HourglassModelEmbed(
                noexp=False, use_embedding=cfg.use_embedding,
                s2d_min_pixels=cfg.s2d_min_pixels,
                merge_reducers=cfg.merge_reducers,
            )
        if cfg.use_cnn:
            self.net_sf = FCNUnet(
                n_down=cfg.n_down, feat=32, block_type="double_conv",
                out_channel=3, norm="none", activation="lrelu",
                pad_type="reflect",
            )
        else:
            self.net_sf = SceneFlowFieldNet(
                net_width=cfg.net_width, n_layers=cfg.n_layers,
                time_dependent=cfg.time_dependent,
                n_freq_xyz=cfg.n_freq_xyz, n_freq_t=cfg.n_freq_t,
                init_type=cfg.init_type, init_param=cfg.init_param,
            )
        def make_tx(lr):
            if cfg.optim == "adam":
                return optax.adam(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2)
            if cfg.optim == "sgd":
                # torch SGD semantics: momentum buffer with dampening,
                # optional L2 weight decay folded into the gradient
                chain = []
                if cfg.wdecay > 0:
                    chain.append(optax.add_decayed_weights(cfg.wdecay))
                if cfg.sgd_momentum > 0:
                    if cfg.sgd_dampening != 0.0:
                        chain.append(_trace_with_dampening(
                            cfg.sgd_momentum, cfg.sgd_dampening))
                    else:
                        chain.append(optax.trace(decay=cfg.sgd_momentum,
                                                 nesterov=False,
                                                 accumulator_dtype=None))
                chain.append(optax.scale(-lr))
                return optax.chain(*chain)
            raise NotImplementedError(f"optimizer {cfg.optim}")

        self.tx_depth = make_tx(cfg.lr)
        self.tx_sf = make_tx(cfg.lr * cfg.scene_lr_mul)

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array, sample_img: jnp.ndarray) -> TrainState:
        """Initialize parameters from a sample image ``[B, H, W, 3]``.

        The flax inits run under jit: eager init dispatches hundreds of tiny
        ops, which is painfully slow through a remote-device tunnel."""
        r1, r2 = jax.random.split(rng)
        v_depth = jax.jit(self.net_depth.init)(r1, sample_img)
        b, h, w, _ = sample_img.shape
        pts = jnp.zeros((b, h, w, 3), jnp.float32)
        ts = jnp.zeros((b, h, w, 1), jnp.float32)
        v_sf = jax.jit(self._init_sf)(r2, pts, ts)
        return TrainState(
            params_depth=v_depth["params"],
            params_sf=v_sf["params"],
            stats_depth=v_depth.get("batch_stats", {}),
            opt_depth=self.tx_depth.init(v_depth["params"]),
            opt_sf=self.tx_sf.init(v_sf["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    def _init_sf(self, rng, pts, ts):
        if self.cfg.use_cnn:
            x = jnp.concatenate([pts, ts], -1) if self.cfg.time_dependent else pts
            return self.net_sf.init(rng, x)
        return self.net_sf.init(rng, pts, ts if self.cfg.time_dependent else None)

    # -------------------------------------------------------------- forwards

    def _apply_depth(self, params_depth, stats_depth, img):
        def fwd(params_depth, stats_depth, img):
            variables = {"params": params_depth}
            if stats_depth:
                variables["batch_stats"] = stats_depth
            dtype = jnp.dtype(self.cfg.compute_dtype)
            if dtype != jnp.float32:
                # bf16 activations through the CNN; params cast per-op by XLA
                img = img.astype(dtype)
                variables = jax.tree.map(lambda p: p.astype(dtype), variables)
            return self.net_depth.apply(variables, img).astype(jnp.float32)

        if self.cfg.remat_depth:
            fwd = jax.checkpoint(fwd)
        return fwd(params_depth, stats_depth, img)

    def _sf_use_pallas(self) -> bool:
        if self.cfg.use_cnn:
            return False
        mode = self.cfg.use_pallas_sf
        if mode == "auto":
            return jax.default_backend() not in ("cpu",)
        return mode in ("1", "true", "on", "yes")

    def _apply_sf(self, params_sf, pts, ts):
        """One scene-flow field query, output already divided by sf_mag_div
        (reference: forward_sf_net, models/scene_flow_motion_field.py:346-358)."""
        if self.cfg.use_cnn:
            x = (
                jnp.concatenate([pts, ts], -1)
                if self.cfg.time_dependent
                else pts
            )
            sf = self.net_sf.apply({"params": params_sf}, x)
        elif self._sf_use_pallas():
            # Fused Pallas path: Fourier embedding AND the dense chain run
            # in one VMEM-resident kernel (ops/pallas/mlp_kernel.py::
            # fused_mlp_embed) — the embedding is linearized as a constant
            # frequency-matrix dot, so the kernel reads only the raw
            # [N, 3] points + [N, 1] times per field evaluation.
            from ..ops.embedding import sceneflow_embed_consts
            from ..ops.pallas import fused_mlp_embed

            b, h, w, _ = pts.shape
            consts = sceneflow_embed_consts(
                self.cfg.n_freq_xyz, self.cfg.n_freq_t,
                self.cfg.time_dependent)
            fx, ft, raw_m, cos_m, sin_m = (jnp.asarray(c) for c in consts)
            n = b * h * w
            ts_flat = (ts.reshape(n, 1) if self.cfg.time_dependent
                       else jnp.zeros((n, 1), pts.dtype))
            names = sorted(params_sf.keys(), key=lambda s: int(s.split("__")[1]))
            ws = tuple(params_sf[n2]["kernel"] for n2 in names)
            bs = tuple(params_sf[n2]["bias"] for n2 in names)
            sf = fused_mlp_embed(pts.reshape(n, 3), ts_flat, fx, ft, raw_m,
                                 cos_m, sin_m, ws, bs).reshape(b, h, w, -1)
        elif self.cfg.time_dependent:
            sf = self.net_sf.apply({"params": params_sf}, pts, ts)
        else:
            sf = self.net_sf.apply({"params": params_sf}, pts)
        return sf / self.cfg.loss.sf_mag_div

    def _sf_chain_on(self) -> bool:
        mode = self.cfg.use_pallas_sf_chain
        if mode == "auto":
            return True  # follow _sf_use_pallas (checked by the caller)
        return mode in ("1", "true", "on", "yes")

    def _sf_multi_step(self, params_sf, pts, ts, time_step, steps: int,
                       want_second: bool = False):
        """Euler integration across the frame gap (reference:
        forward_sf_net_multi_step, models/scene_flow_motion_field.py:360-367).
        ``steps`` is static; the unrolled chain is a sequence of MXU matmuls
        XLA pipelines back-to-back. Also returns the first TWO evaluations —
        the acceleration regularizer queries the field at exactly (p1, t1)
        and (p1 + sf0, t1 + dt) (reference recomputes both,
        models/scene_flow_motion_field.py:329-341; the expressions are
        identical to Euler evals 1 and 2, so at steps >= 2 the regularizer
        costs zero extra field evaluations). With ``want_second`` at
        steps == 1 the regularizer's second query joins the chain as a
        phantom evaluation (advects, does not accumulate).

        On TPU with the fused MLP on, the whole chain runs as ONE Pallas
        megakernel (fused_mlp_embed_chain): one launch instead of a
        fwd+VJP pair per Euler step, points resident in VMEM throughout."""
        n_evals = max(2, steps) if want_second else steps
        if n_evals >= 2 and self._sf_use_pallas() and self._sf_chain_on():
            from ..ops.embedding import sceneflow_embed_consts
            from ..ops.pallas import fused_mlp_embed_chain, pick_chain_tile

            b, h, w, _ = pts.shape
            consts = sceneflow_embed_consts(
                self.cfg.n_freq_xyz, self.cfg.n_freq_t,
                self.cfg.time_dependent)
            fx, ft, raw_m, cos_m, sin_m = (jnp.asarray(c) for c in consts)
            names = sorted(params_sf.keys(),
                           key=lambda s: int(s.split("__")[1]))
            ws = tuple(params_sf[n2]["kernel"] for n2 in names)
            bs = tuple(params_sf[n2]["bias"] for n2 in names)
            # VMEM-budget gate: 'auto' may only select chain configs whose
            # modeled backward footprint fits the 16 MB scoped budget
            # (round-3 lesson: an ungated chain OOMed on hardware at the
            # canonical shape). None -> per-eval fallback below.
            if pick_chain_tile(raw_m.shape[1], [w2.shape[1] for w2 in ws],
                               n_evals) is not None:
                n = b * h * w
                if self.cfg.time_dependent:
                    ts_flat = ts.reshape(n, 1)
                    dt_flat = jnp.broadcast_to(
                        time_step, ts.shape).reshape(n, 1).astype(pts.dtype)
                else:
                    ts_flat = jnp.zeros((n, 1), pts.dtype)
                    dt_flat = jnp.zeros((n, 1), pts.dtype)
                acc, f0, f1 = fused_mlp_embed_chain(
                    pts.reshape(n, 3), ts_flat, dt_flat, fx, ft, raw_m,
                    cos_m, sin_m, ws, bs, steps, n_evals,
                    float(self.cfg.loss.sf_mag_div),
                )
                shape = (b, h, w, 3)
                return (acc.reshape(shape), f0.reshape(shape),
                        f1.reshape(shape) if n_evals >= 2 else None)
        sf_acc = jnp.zeros_like(pts)
        evals = []
        for _ in range(steps):
            sf = self._apply_sf(params_sf, pts, ts)
            if len(evals) < 2:
                evals.append(sf)
            sf_acc = sf_acc + sf
            pts = pts + sf
            ts = ts + time_step
        first_sf = evals[0] if evals else None
        second_sf = evals[1] if len(evals) > 1 else None
        return sf_acc, first_sf, second_sf

    # ------------------------------------------------------------ train step

    def _warp_fn(self, full_warp: bool = False):
        """Backward-warp implementation: the fused Pallas kernel on TPU
        (ops/pallas/warp_kernel.py — gather-free tent-matmul warp with a
        custom src-only VJP), XLA grid-sample elsewhere. The flow is data
        (never differentiated), which the Pallas VJP contract requires.

        ``full_warp`` switches this step specialization to the full-height
        window — always exact — for batches whose observed flow violates the
        configured window's exactness bound (the data layer computes each
        sample's ``required_window``; the trainer compares and sets the
        static flag, so no configuration silently approximates)."""
        mode = self.cfg.use_pallas_warp
        on = (jax.default_backend() not in ("cpu",)) if mode == "auto" \
            else mode in ("1", "true", "on", "yes")
        if not on:
            return None  # depth_warp_stage defaults to the XLA path
        from ..ops.pallas import fused_backward_warp

        win = None if full_warp else self.cfg.pallas_warp_window

        def warp(buf, flow):
            return fused_backward_warp(buf, jax.lax.stop_gradient(flow), win)

        return warp

    def _forward(self, params_depth, params_sf, stats_depth, batch,
                 steps: int, full_warp: bool = False,
                 want_second: bool = False):
        """(reference: _predict_on_batch, models/scene_flow_motion_field.py:
        229-264). The reference's flow_by_depth + scene_flow_projection pair
        is merged: shared unprojections computed once and ONE fused
        4-channel warp serves both (see ops.geometry.depth_warp_stage)."""
        cam_1, cam_2 = _batch_cameras(batch)
        # one batched depth forward for both frames: at batch 1 the conv
        # launch is tiny; doubling the batch improves MXU occupancy and
        # halves kernel count vs the reference's two sequential forwards
        b = batch["img_1"].shape[0]
        imgs = jnp.concatenate([batch["img_1"], batch["img_2"]], axis=0)
        depths = self._apply_depth(params_depth, stats_depth, imgs)
        depth_1, depth_2 = depths[:b], depths[b:]

        stage = depth_warp_stage(
            depth_1, depth_2, batch["flow_1_2"], cam_1, cam_2,
            warp_fn=self._warp_fn(full_warp),
        )
        global_p1 = stage["global_p1"]

        time_step = batch["time_step"]
        sf_1_2, first_sf, second_sf = self._sf_multi_step(
            params_sf, global_p1, batch["time_stamp_1"], time_step, steps,
            want_second=want_second,
        )
        if self.cfg.use_motion_seg:
            sf_1_2 = sf_1_2 * batch["motion_seg_1"]

        pred = projection_stage(depth_1, depth_2, cam_2, sf_1_2, stage)
        pred["sf_1_2"] = sf_1_2
        pred["sf_by_dep_1_2"] = stage["sf_by_depth"]
        pred["global_p1"] = global_p1
        pred["_first_sf"] = first_sf
        pred["_second_sf"] = second_sf
        return pred

    def _acc_reg(self, params_sf, global_p1, ts, time_step, sf0=None,
                 sf1=None):
        """(reference: _opt_reg, models/scene_flow_motion_field.py:326-344).
        ``sf0`` (the field at (p1, t1)) and ``sf1`` (at (p1 + sf0, t1 + dt))
        are reused from the Euler integration when available instead of
        re-evaluating — evals 1 and 2 of the chain are the exact same
        expressions, so at steps >= 2 the regularizer is free."""
        if sf0 is None:
            sf0 = self._apply_sf(params_sf, global_p1, ts)
        if sf1 is None:
            sf1 = self._apply_sf(params_sf, global_p1 + sf0, ts + time_step)
        return self.cfg.loss.acc_mul * jnp.mean(jnp.abs(sf1 - sf0))

    # Interleaved hardware A/Bs (RESULTS.md, round 3) put the fused
    # projection+loss kernel's crossover between 224x384 (~0.7 ms net cost:
    # per-op overhead dominates and XLA fuses the projection math fine) and
    # 320x576 (~1.5 ms win: skipping the intermediate HBM round trips pays
    # once the per-pixel working set is large). 'auto' switches at 2^17 px.
    _PALLAS_LOSS_AUTO_MIN_PIXELS = 131072

    def _loss_use_pallas(self, pixels: int) -> bool:
        mode = self.cfg.use_pallas_loss
        if mode == "auto":
            return (jax.default_backend() not in ("cpu",)
                    and pixels >= self._PALLAS_LOSS_AUTO_MIN_PIXELS)
        return mode in ("1", "true", "on", "yes")

    def _fused_loss_forward(self, params_depth, params_sf, stats_depth,
                            batch, steps: int, warm: bool,
                            full_warp: bool = False,
                            want_second: bool = False):
        """Lean training-loss forward where everything between the depth CNN
        and the scalar losses runs as Pallas kernels: fused 3-channel warp
        (the vis-only warped depth is skipped), fused scene-flow MLP, and
        the fused projection+loss kernel (ops/pallas/loss_kernel.py).
        Produces exactly the losses/logs of the XLA path
        (tests/test_pallas_step.py pins step-level parity)."""
        from ..ops.geometry import camera_to_world, unproject_camera
        from ..ops.grid_sample import backward_warp
        from ..ops.pallas import fused_projection_loss, pack_camera
        from .losses import _MASK_EPS

        cfg = self.cfg.loss
        cam_1, cam_2 = _batch_cameras(batch)
        b = batch["img_1"].shape[0]
        imgs = jnp.concatenate([batch["img_1"], batch["img_2"]], axis=0)
        depths = self._apply_depth(params_depth, stats_depth, imgs)
        depth_1, depth_2 = depths[:b], depths[b:]

        flow = jax.lax.stop_gradient(batch["flow_1_2"])
        p2_cam2 = unproject_camera(depth_2, cam_2)
        warp_fn = self._warp_fn(full_warp)
        warped3 = (warp_fn or backward_warp)(p2_cam2, flow)

        global_p1 = camera_to_world(unproject_camera(depth_1, cam_1), cam_1)
        sf_1_2, first_sf, second_sf = self._sf_multi_step(
            params_sf, global_p1, batch["time_stamp_1"],
            batch["time_step"], steps, want_second=want_second,
        )
        if self.cfg.use_motion_seg:
            sf_1_2 = sf_1_2 * batch["motion_seg_1"]

        sums = fused_projection_loss(
            global_p1, warped3, sf_1_2, batch["flow_1_2"], batch["mask_2"],
            jax.lax.stop_gradient(depth_1), pack_camera(cam_2),
            cfg.use_disp, cfg.use_disp_ratio, cfg.midas, warm,
        )
        denom = sums[3] + _MASK_EPS
        flow_loss = sums[0] / denom
        disp_loss = sums[1] / denom
        sf_loss = sums[2] / denom
        second = disp_loss if cfg.use_disp else sf_loss
        main = flow_loss * cfg.flow_mul + second * cfg.disp_mul
        logs = {
            "loss": main,
            "flow_loss_1_2": flow_loss,
            "disp_loss_1_2": disp_loss,
            "sf_loss": sf_loss,
        }
        return main, logs, global_p1, first_sf, second_sf

    def loss_and_logs(self, params_depth, params_sf, stats_depth, batch,
                      steps: int, warm: bool, full_warp: bool = False):
        cfg = self.cfg.loss
        pixels = batch["img_1"].shape[1] * batch["img_1"].shape[2]
        use_reg = (
            cfg.interp_steps > 0 and (not warm or cfg.warm_reg) and cfg.acc_mul > 0
        )
        if self._loss_use_pallas(pixels):
            (main, logs, global_p1, first_sf,
             second_sf) = self._fused_loss_forward(
                params_depth, params_sf, stats_depth, batch, steps, warm,
                full_warp, want_second=use_reg,
            )
            pred = {"global_p1": global_p1}
        else:
            pred = self._forward(params_depth, params_sf, stats_depth,
                                 batch, steps, full_warp,
                                 want_second=use_reg)
            first_sf = pred.pop("_first_sf", None)
            second_sf = pred.pop("_second_sf", None)
            main, logs = consistency_losses(
                pred, batch["flow_1_2"], batch["mask_2"], cfg, warm
            )
        total = main * steps if cfg.weight_steps else main
        if use_reg:
            reg = self._acc_reg(
                params_sf, pred["global_p1"], batch["time_stamp_1"],
                batch["time_step"], sf0=first_sf, sf1=second_sf,
            )
            total = total + reg
            logs["acc_reg"] = reg
        else:
            logs["acc_reg"] = jnp.zeros(())
        return total, logs

    @partial(jax.jit, static_argnames=("self", "steps", "warm", "full_warp"),
             donate_argnames=("state",))
    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                   steps: int, warm: bool, full_warp: bool = False
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One fused optimization step. ``steps``/``warm``/``full_warp``
        are static."""
        return self.train_step_impl(state, batch, steps, warm, full_warp)

    def train_step_impl(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                        steps: int, warm: bool, full_warp: bool = False):
        """Un-jitted step body — reused by the multi-video vmap/shard path
        (parallel/multi_video.py)."""

        def loss_fn(params_depth, params_sf):
            if warm:
                # Depth net frozen during warm-up (reference:
                # models/scene_flow_motion_field.py:154-164). stop_gradient
                # lets XLA prune the entire depth backward.
                params_depth = jax.lax.stop_gradient(params_depth)
            return self.loss_and_logs(
                params_depth, params_sf, state.stats_depth, batch, steps,
                warm, full_warp,
            )

        (_, logs), (g_depth, g_sf) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params_depth, state.params_sf)
        if self.cfg.log_grad_stats:
            max_abs = lambda t: jax.tree.reduce(
                jnp.maximum,
                jax.tree.map(lambda x: jnp.max(jnp.abs(x)), t),
                jnp.zeros(()),
            )
            logs["grad_norm_depth"] = optax.global_norm(g_depth)
            logs["grad_norm_sf"] = optax.global_norm(g_sf)
            logs["grad_max_depth"] = max_abs(g_depth)
            logs["grad_max_sf"] = max_abs(g_sf)
        # one packed vector so the host can fetch ALL step metrics in a
        # single (async) transfer instead of one roundtrip per scalar
        logs["_packed"] = jnp.stack([logs[k] for k in sorted(logs)])

        upd_sf, opt_sf = self.tx_sf.update(g_sf, state.opt_sf, state.params_sf)
        params_sf = optax.apply_updates(state.params_sf, upd_sf)

        if warm:
            params_depth, opt_depth = state.params_depth, state.opt_depth
        else:
            upd_d, opt_depth = self.tx_depth.update(
                g_depth, state.opt_depth, state.params_depth
            )
            params_depth = optax.apply_updates(state.params_depth, upd_d)

        new_state = state.replace(
            params_depth=params_depth,
            params_sf=params_sf,
            opt_depth=opt_depth,
            opt_sf=opt_sf,
            step=state.step + 1,
        )
        return new_state, logs

    @partial(jax.jit, static_argnames=("self", "steps", "warm"))
    def grad_snapshot(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                      steps: int, warm: bool = False):
        """Raw per-parameter gradient pytrees for debugging — the
        functional analog of the reference's ``dict_grad_hook_factory``
        (reference: models/netinterface.py:402-411): instead of registering
        hooks on mutable modules, take the same gradients as the train step
        without applying updates and inspect any leaf by name."""
        def loss_fn(pd, ps):
            return self.loss_and_logs(pd, ps, state.stats_depth, batch,
                                      steps, warm)

        (_, _), (g_depth, g_sf) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params_depth, state.params_sf)
        return {"net_depth": g_depth, "net_sceneflow": g_sf}

    # ------------------------------------------------------- vali/test steps

    @partial(jax.jit, static_argnames=("self", "steps", "warm", "full_warp"),
             donate_argnames=("state",))
    def train_step_scan(self, state: TrainState,
                        batches: Dict[str, jnp.ndarray], steps: int,
                        warm: bool, full_warp: bool = False):
        """K optimization steps in ONE dispatch via lax.scan over stacked
        same-gap batches (leaves ``[K, B, ...]``). Amortizes per-call
        dispatch latency — decisive on remote-attached devices, harmless
        locally. Returns (state, packed_logs [K, n_metrics])."""

        def body(s, b):
            s2, logs = self.train_step_impl(s, b, steps, warm, full_warp)
            return s2, logs["_packed"]

        return jax.lax.scan(body, state, batches)

    @partial(jax.jit, static_argnames=("self", "steps", "full_warp"))
    def forward_vis(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                    steps: int, full_warp: bool = False):
        """Prediction dict for visualization dumps (reference packs pred to
        host every batch, models/scene_flow_motion_field.py:201-202; we only
        run this on visualized batches)."""
        pred = self._forward(state.params_depth, state.params_sf,
                             state.stats_depth, batch, steps, full_warp)
        pred.pop("_first_sf", None)
        pred.pop("_second_sf", None)
        # per-pixel scene-flow residual map the reference packs for analysis
        # (reference: models/scene_flow_motion_field.py:306 sf_loss_pp)
        pred["sf_loss_pp"] = jnp.sum(
            jnp.abs(pred["sf_by_dep_1_2"] - pred["sf_1_2"]), axis=-1
        )
        return pred

    @partial(jax.jit, static_argnames=("self",))
    def predict(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        """Single-frame inference (reference: _predict_on_batch is_train=False,
        models/scene_flow_motion_field.py:266-275)."""
        return self.predict_impl(state, batch)

    def predict_impl(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        depth = self._apply_depth(
            state.params_depth, state.stats_depth, batch["img"]
        )
        cam_1 = Camera(batch["R_1"], batch["t_1"], batch["K"], batch["K_inv"])
        global_p1 = unproject(depth, cam_1)
        sf_1_2, _, _ = self._sf_multi_step(
            state.params_sf, global_p1, batch["time_stamp_1"],
            batch["time_step"], steps=1,
        )
        return {"depth": depth, "sf_1_2": sf_1_2}

    @partial(jax.jit, static_argnames=("self",))
    def vali_step(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        """(reference: _vali_on_batch, models/video_base.py:76-103)."""
        return self.vali_step_impl(state, batch)

    def vali_step_impl(self, state: TrainState, batch: Dict[str, jnp.ndarray]):
        pred = self.predict_impl(state, batch)
        loss = disparity_vali_loss(pred["depth"], batch["depth_mvs"])
        return pred, {"loss": loss}
