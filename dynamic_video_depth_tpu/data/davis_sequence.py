"""DAVIS track dataset (reference: datasets/davis_sequence.py).

Train mode streams the packed per-pair ``.pt`` batches (grouped by frame
gap); vali mode streams the per-frame ``.npz`` files. Batches come out in the
channel-last schema of ``data.batches``.
"""

from __future__ import annotations

import re
from glob import glob
from os.path import join

import numpy as np

from .base import BaseDataset
from .batches import frame_batch_from_npz, load_packed_pt, pair_batch_from_packed


class Dataset(BaseDataset):
    data_root = "./datafiles/davis_processed"
    frame_prefix = "frames_midas"
    seq_prefix = "sequences_select_pairs_midas"

    @classmethod
    def add_arguments(cls, parser):
        parser.add_argument("--cache", action="store_true",
                            help="cache the data into ram")
        parser.add_argument("--subsample", action="store_true",
                            help="subsample the video in time")
        parser.add_argument("--track_id", default="train", type=str,
                            help="the track id to load")
        parser.add_argument("--overfit", action="store_true",
                            help="overfit and see if things works")
        parser.add_argument("--capat", type=int, default=1,
                            help="number of samples to overfit to")
        parser.add_argument("--gaps", type=str, default="1,2,3,4",
                            help="gaps for sequences")
        parser.add_argument("--repeat", type=int, default=1,
                            help="number of repeatition")
        parser.add_argument("--select", action="store_true", help="pred")
        return parser, set()

    def __init__(self, opt, mode="train", model=None):
        super().__init__(opt, mode, model)
        track = opt.track_id
        data_root = getattr(opt, "data_root", None) or self.data_root
        self.unit = 2.0 if opt.subsample else 1.0
        self._cache = {} if getattr(opt, "cache", False) else None

        frame_dir = join(data_root, self.frame_prefix, track)
        self.n_frames = float(len(sorted(glob(join(frame_dir, "*.npz")))))

        if mode == "train":
            sub = "subsample" if opt.subsample else "%03d" % 1
            data_path = join(data_root, self.seq_prefix, track, sub)
            gaps = [int(x) for x in opt.gaps.split(",")]
            self.file_list = []
            for g in gaps:
                self.file_list += sorted(
                    glob(join(data_path, f"shuffle_False_gap_{g:02d}_*.pt"))
                )
        else:
            self.file_list = sorted(glob(join(frame_dir, "*.npz")))
            self.n_frames = float(len(self.file_list))

    def __len__(self):
        if self.mode != "train":
            return len(self.file_list)
        return len(self.file_list) * self.opt.repeat

    def gap_of(self, idx: int) -> int:
        """Frame gap of sample idx (static bucket key for jit)."""
        m = re.search(r"gap_(\d+)_", self.file_list[idx % len(self.file_list)])
        return int(m.group(1)) if m else 1

    def __getitem__(self, idx: int):
        if getattr(self.opt, "overfit", False):
            idx = idx % self.opt.capat
        else:
            idx = idx % len(self.file_list)
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]

        path = self.file_list[idx]
        if self.mode == "train":
            raw = load_packed_pt(path)
            batch = pair_batch_from_packed(raw, self.n_frames, self.unit)
            # host-side Euler step count: avoids a device roundtrip per step
            batch["steps"] = max(int(round(self.gap_of(idx) / self.unit)), 1)
            # minimal exact fused-warp window for THIS sample's observed
            # flow — the trainer compares it against the configured window
            # and falls back to the always-exact full-height warp when
            # exceeded (no silent approximation at any resolution)
            from ..ops.pallas.warp_kernel import required_window

            batch["warp_window"] = required_window(batch["flow_1_2"])
        else:
            raw = dict(np.load(path, allow_pickle=True))
            batch = frame_batch_from_npz(raw, idx, self.n_frames, self.unit)
        batch["pair_path"] = path
        if self._cache is not None:
            self._cache[idx] = batch
        return batch
