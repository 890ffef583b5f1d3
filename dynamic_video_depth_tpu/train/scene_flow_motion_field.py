"""The scene-flow motion-field trainer — the framework's flagship model
(reference: models/scene_flow_motion_field.py).

Registry alias: ``get_model('scene_flow_motion_field')``. Exposes the
reference's CLI surface via ``add_arguments`` and wraps the functional
``SceneFlowMotionFieldStep`` with pretrained-weight loading, warm-up
scheduling and batch bookkeeping."""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.torch_port import load_torch_state_dict, port_torch_variables
from .losses import LossConfig
from .step import SceneFlowMotionFieldStep, TrainStepConfig

# Pretrained checkpoint locations (reference: configs/__init__.py:15-16);
# overridable via environment for nonstandard layouts.
MIDAS_PRETRAIN_PATH = os.environ.get(
    "DVD_MIDAS_CKPT", "./pretrained_depth_ckpt/midas_cpkt.pt"
)
DEPTH_PRETRAIN_PATH = os.environ.get(
    "DVD_HOURGLASS_CKPT",
    "./pretrained_depth_ckpt/best_depth_Ours_Bilinear_inc_3_net_G.pth",
)


class Model:
    @classmethod
    def add_arguments(cls, parser):
        """(reference: models/scene_flow_motion_field.py:33-67)"""
        a = parser.add_argument
        a("--l1_mul", type=float, default=1e-4, help="L1 multiplier")
        a("--disp_mul", type=float, default=10, help="disparity multiplier")
        a("--one_way", action="store_true", help="use only losses on 1 to 2")
        a("--loss_type", type=str, default="l2", help="use l2 on sceneflow")
        a("--scene_lr_mul", type=float, default=1,
          help="lr multiplier for scene flow network")
        a("--n_down", type=int, default=3, help="sf net size")
        a("--weight_steps", action="store_true", help="weight steps by baselines")
        a("--sf_min_mul", type=float, default=0, help="minimize sf")
        a("--sf_quantile", type=float, default=0.5,
          help="minimize sf for 50%% pixels")
        a("--static", action="store_true",
          help="optimize static regions with skip frames")
        a("--static_mul", type=float, default=1)
        a("--flow_mul", type=float, default=10)
        a("--acc_mul", type=float, default=100)
        a("--si_mul", type=float, default=0)
        a("--cos_mul", type=float, default=0)
        a("--motion_seg_hard", action="store_true")
        a("--warm_mul", type=float, default=1)
        a("--interp_steps", type=int, default=5)
        a("--warm_static", action="store_true")
        a("--use_disp", action="store_true")
        a("--use_disp_ratio", action="store_true")
        a("--time_dependent", action="store_true")
        a("--use_cnn", action="store_true")
        a("--use_embedding", action="store_true")
        a("--use_motion_seg", action="store_true")
        a("--warm_reg", action="store_true")
        a("--warm_sf", type=int, default=0)
        a("--n_freq_xyz", type=int, default=16)
        a("--n_freq_t", type=int, default=16)
        a("--sf_mag_div", type=float, default=100)
        a("--midas", action="store_true")
        a("--depth_net", type=str, default="",
          help="override depth net: '' defers to --midas, or explicitly "
               "'midas'/'hourglass' (loss math + pretrained ckpt follow "
               "the explicit choice) / 'tiny' for smoke tests")
        a("--log_grad_stats", action="store_true",
          help="log per-net gradient norms / max-abs each step (device "
               "scalars on the packed async fetch; the functional analog "
               "of the reference's grad-hook debug utilities)")
        a("--dense_group_width", type=int, default=16,
          help="densify ResNeXt grouped convs whose per-group width is <= "
               "this as block-diagonal dense convs (exact; groups-x more "
               "FLOPs at dense MXU rates). 0 keeps every conv grouped.")
        a("--merge_group_width", type=int, default=128,
          help="merge wider ResNeXt conv groups into block-diagonal dense "
               "groups of at least this many input lanes (0 = off; default "
               "128 fills the MXU's 128-lane contraction — measured 1.20x "
               "step win over grouped stages 3-4 on v5e)")
        a("--s2d_min_pixels", type=int, default=16384,
          help="hourglass: run narrow inception branch convs on feature "
               "maps of >= this many pixels in 2x2 space-to-depth space "
               "(exact; 4x MXU lanes for 4*k'^2/k^2 FLOPs — the spatial "
               "analog of --dense_group_width). 0 = off.")
        a("--merge_reducers", type=int, default=1,
          help="hourglass: compute each inception's four parallel 1x1 "
               "reducer convs + BNs + relu as ONE concatenated conv + one "
               "elementwise stage (exact; widens 32-lane output blocks to "
               "a full 128-lane MXU pass). 0 = off.")
        for knob, what in (("sf", "fused scene-flow MLP (embedding "
                                  "in-kernel)"),
                           ("sf_chain", "Euler-chain megakernel (whole "
                                        "multi-step integration + the "
                                        "acc-reg's second field query in "
                                        "ONE launch; needs use_pallas_sf)"),
                           ("warp", "fused backward warp"),
                           ("loss", "fused projection+loss kernel")):
            a(f"--use_pallas_{knob}", choices=("auto", "on", "off"),
              default="auto",
              help=f"Pallas {what}: auto = on for TPU backends "
                   "(loss: also resolution-gated), off = XLA fallback — "
                   "the escape hatch if a kernel misbehaves at an "
                   "untested configuration")
        return parser, set()

    metrics = ["flow_loss_1_2", "loss", "disp_loss_1_2", "data_time",
               "acc_reg", "sf_loss"]
    # metric keys packed into the step's single fetched vector (sorted order)
    metrics_packed = ["acc_reg", "disp_loss_1_2", "flow_loss_1_2", "loss",
                      "sf_loss"]

    def __init__(self, opt, logger=None):
        self.opt = opt
        self.logger = logger
        compute_dtype = "float32"
        if getattr(opt, "mixed_precision_training", False):
            compute_dtype = "bfloat16"
        if getattr(opt, "full_precision", False):
            compute_dtype = "float32"
        # ONE source of truth for "is the depth net MiDaS": an explicit
        # --depth_net overrides the --midas flag, and everything keyed on
        # MiDaS-ness (net selection in step.py, the loss's depth/disparity
        # transform, the pretrained ckpt path) must agree — round 5's
        # depth_net validation made the net explicit but left loss/ckpt on
        # the raw flag, which silently mixed MiDaS output with hourglass
        # loss math under --depth_net midas.
        depth_net = getattr(opt, "depth_net", "") or ""
        eff_midas = depth_net == "midas" or (depth_net == "" and opt.midas)
        self.cfg = TrainStepConfig(
            optim=getattr(opt, "optim", "adam"),
            lr=opt.lr,
            scene_lr_mul=opt.scene_lr_mul,
            adam_beta1=getattr(opt, "adam_beta1", 0.5),
            adam_beta2=getattr(opt, "adam_beta2", 0.9),
            sgd_momentum=getattr(opt, "sgd_momentum", 0.9),
            sgd_dampening=getattr(opt, "sgd_dampening", 0.0),
            wdecay=getattr(opt, "wdecay", 0.0),
            midas=eff_midas,
            depth_net=depth_net,
            use_cnn=opt.use_cnn,
            use_embedding=opt.use_embedding,
            time_dependent=opt.time_dependent,
            n_freq_xyz=opt.n_freq_xyz,
            n_freq_t=opt.n_freq_t,
            n_down=opt.n_down,
            init_type=getattr(opt, "init_type", "kaiming") or "kaiming",
            loss=LossConfig(
                flow_mul=opt.flow_mul,
                disp_mul=opt.disp_mul,
                acc_mul=opt.acc_mul,
                sf_mag_div=opt.sf_mag_div,
                use_disp=opt.use_disp,
                use_disp_ratio=opt.use_disp_ratio,
                midas=eff_midas,
                weight_steps=opt.weight_steps,
                warm_reg=opt.warm_reg,
                interp_steps=opt.interp_steps,
            ),
            use_motion_seg=opt.use_motion_seg,
            compute_dtype=compute_dtype,
            remat_depth=getattr(opt, "remat_depth", False),
            dense_group_width=getattr(opt, "dense_group_width", 16),
            merge_group_width=getattr(opt, "merge_group_width", 128),
            s2d_min_pixels=getattr(opt, "s2d_min_pixels", 16384),
            merge_reducers=bool(getattr(opt, "merge_reducers", 1)),
            log_grad_stats=getattr(opt, "log_grad_stats", False),
            use_pallas_sf=getattr(opt, "use_pallas_sf", "auto"),
            use_pallas_sf_chain=getattr(opt, "use_pallas_sf_chain", "auto"),
            use_pallas_warp=getattr(opt, "use_pallas_warp", "auto"),
            use_pallas_loss=getattr(opt, "use_pallas_loss", "auto"),
        )
        self.step = SceneFlowMotionFieldStep(self.cfg)
        self.state = None
        self.last_pred = None
        if self.cfg.log_grad_stats:
            # instance copies: the packed metric key set must match what
            # the step emits (the chunked/fleet flush paths read it)
            extra = ["grad_max_depth", "grad_max_sf",
                     "grad_norm_depth", "grad_norm_sf"]
            self.metrics = list(self.metrics) + extra
            self.metrics_packed = sorted(list(self.metrics_packed) + extra)

    # ------------------------------------------------------------------ setup

    def init_from_sample(self, sample_img: np.ndarray, seed: int = 0):
        """Initialize parameters, then overwrite with pretrained torch weights
        when the checkpoint artifacts are present (reference:
        models/scene_flow_motion_field.py:94-121)."""
        self.state = self.step.init_state(
            jax.random.PRNGKey(seed), jnp.asarray(sample_img)
        )
        path = MIDAS_PRETRAIN_PATH if self.cfg.midas else DEPTH_PRETRAIN_PATH
        used_pretrained = False
        # explicit real-net names load their pretrained artifact too; only
        # the test-only 'tiny' net skips (cfg.midas is already the
        # effective MiDaS-ness, explicit depth_net included)
        if self.cfg.depth_net in ("", "midas", "hourglass"):
            if os.path.isfile(path):
                self.load_pretrained_depth(path)
                used_pretrained = True
            else:
                print(f"Warning: pretrained depth checkpoint {path} not found; "
                      "using random init. Fetch the official artifacts with "
                      "scripts/download_data_and_depth_ckpt.sh or point "
                      "DVD_MIDAS_CKPT / DVD_HOURGLASS_CKPT at them.")
        return used_pretrained

    def load_pretrained_depth(self, path: str):
        sd = load_torch_state_dict(path)
        variables = {"params": self.state.params_depth}
        if self.state.stats_depth:
            variables["batch_stats"] = self.state.stats_depth
        if not self.cfg.midas:
            # the hourglass ckpt stores the inner HourglassModel's keys;
            # our wrapper nests them under 'net_depth' (reference loads it
            # via self.net_depth.net_depth.load_state_dict,
            # models/scene_flow_motion_field.py:121)
            sd = {"net_depth." + k: v for k, v in sd.items()}
        ported = port_torch_variables(variables, sd)
        from ..models.torch_port import unused_torch_keys

        # Keys legitimately unconsumed: torch BN bookkeeping, MiDaS's
        # refinenet4.resConfUnit1 (constructed but never called by the
        # reference, third_party/midas_blocks.py:152-160), and the
        # hourglass's uncertainty_layer (constructed, never used in forward,
        # third_party/hourglass.py:172-188). Anything else means the
        # checkpoint layout drifted — fail loudly, a silently dropped
        # weight corrupts every downstream result.
        allowed = ("num_batches", "refinenet4.resConfUnit1",
                   "uncertainty_layer")
        leftovers = [
            k for k in unused_torch_keys(variables, sd)
            if not any(a in k for a in allowed)
        ]
        if leftovers:
            raise KeyError(
                f"depth checkpoint keys not consumed by the port "
                f"(layout drift?): {leftovers[:5]}"
            )
        self.state = self.state.replace(
            params_depth=ported["params"],
            stats_depth=ported.get("batch_stats", self.state.stats_depth),
        )

    # ------------------------------------------------------------------ steps

    @staticmethod
    def batch_steps(batch: Dict) -> int:
        """Static Euler step count = round(mean(ts2 - ts1) / time_step)
        (reference: models/scene_flow_motion_field.py:247-249) — this honors
        the --subsample time unit. Host-syncs three scalars, which the
        prefetcher has already materialized."""
        ts1 = float(np.asarray(batch["time_stamp_1"]).ravel()[0])
        ts2 = float(np.asarray(batch["time_stamp_2"]).ravel()[0])
        dt = float(np.asarray(batch["time_step"]))
        return max(int(round(abs(ts2 - ts1) / dt)), 1)

    def _full_warp(self, warp_window: Optional[int]) -> bool:
        """True when this batch's observed flow needs a larger fused-warp
        window than configured: switch to the always-exact full-height
        specialization instead of silently clamping (the window bound is
        computed per sample at the data boundary, data/davis_sequence.py)."""
        win = self.cfg.pallas_warp_window
        if win is None or warp_window is None:
            return False
        # callers may hand a stacked [K]/[B] vector of per-sample bounds
        return int(np.max(np.asarray(warp_window))) > int(win)

    def train_on_batch(self, epoch: int, batch_idx: int, batch: Dict,
                       warm: Optional[bool] = None,
                       steps: Optional[int] = None,
                       warp_window: Optional[int] = None) -> Dict:
        if warm is None:
            warm = epoch <= getattr(self.opt, "warm_sf", 0)
        if steps is None:
            steps = batch.pop("steps", None)
        if steps is None:
            steps = self.batch_steps(batch)
        if warp_window is None:
            warp_window = batch.get("warp_window")
        batch = {k: v for k, v in batch.items()
                 if k not in ("steps", "warp_window")}
        self.state, logs = self.step.train_step(
            self.state, batch, steps=int(steps), warm=bool(warm),
            full_warp=self._full_warp(warp_window),
        )
        logs["size"] = int(batch["img_1"].shape[0])
        return logs

    def train_on_chunk(self, epoch: int, batches: Dict, steps: int,
                       warm: Optional[bool] = None,
                       warp_window: Optional[int] = None):
        """K lockstep optimization steps in one dispatch (leaves [K, B, ...]).
        Returns packed per-step metrics [K, n] (fetch asynchronously)."""
        if warm is None:
            warm = epoch <= getattr(self.opt, "warm_sf", 0)
        if warp_window is None:
            warp_window = batches.get("warp_window")
        batches = {k: v for k, v in batches.items()
                   if k not in ("steps", "pair_path", "warp_window")}
        self.state, packed = self.step.train_step_scan(
            self.state, batches, steps=int(steps), warm=bool(warm),
            full_warp=self._full_warp(warp_window),
        )
        return packed

    def vali_on_batch(self, epoch: int, batch_idx: int, batch: Dict) -> Dict:
        pred, logs = self.step.vali_step(self.state, batch)
        self.last_pred = pred
        logs["size"] = int(batch["img"].shape[0])
        return logs

    def test_on_batch(self, batch_idx: int, batch: Dict) -> Dict:
        pred, _ = self.step.vali_step(self.state, batch)
        return {k: np.asarray(v) for k, v in pred.items()}

    def count_params(self) -> Dict[str, int]:
        """(reference: NetInterface param counting, models/netinterface.py:
        433-440)."""
        count = lambda tree: int(sum(p.size for p in jax.tree.leaves(tree)))
        return {
            "net_depth": count(self.state.params_depth),
            "net_sceneflow": count(self.state.params_sf),
        }

    def vis_on_batch(self, batch: Dict,
                     warp_window: Optional[int] = None,
                     as_numpy: bool = True) -> Dict:
        """Prediction dict for visualization (train-pair batches).
        ``warp_window`` is the batch's per-sample exactness bound: batches
        the trainer escalated to the full-height warp visualize through the
        same exact specialization, so dumped maps match the optimized
        losses. ``as_numpy=False`` returns DEVICE arrays so an async
        consumer (train.py's vis worker) can do the device->host fetch off
        the step loop — the inline fetch is tens of MB through the
        tunnel."""
        steps = self.batch_steps(batch)
        pred = self.step.forward_vis(self.state, batch, steps=steps,
                                     full_warp=self._full_warp(warp_window))
        if not as_numpy:
            return dict(pred)
        return {k: np.asarray(v) for k, v in pred.items()}

    def pack_output(self, pred: Dict, batch: Dict) -> Dict:
        """(reference: pack_output, models/video_base.py:105-126)."""
        out = dict(pred)
        if "img" in batch:
            out["img_1"] = np.asarray(batch["img"])
            out["depth_nn"] = np.asarray(batch["depth_pred"])
            out["depth_gt"] = np.asarray(batch["depth_mvs"])
        else:
            out["img_1"] = np.asarray(batch["img_1"])
            out["img_2"] = np.asarray(batch["img_2"])
            out["flow_1_2"] = np.asarray(batch["flow_1_2"])
            out["flow_2_1"] = np.asarray(batch["flow_2_1"])
            out["depth_nn_1"] = np.asarray(batch["depth_pred_1"])
        return out
