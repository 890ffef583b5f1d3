"""ShutterStock track dataset (reference: datasets/shutterstock.py).

Identical mechanics to the DAVIS reader with a different data root; the
reference additionally selects the track by sorted index
(datasets/shutterstock.py:40-43), which we support when ``track_id`` is an
integer string.
"""

from __future__ import annotations

from glob import glob
from os.path import join

from . import davis_sequence


class Dataset(davis_sequence.Dataset):
    data_root = "./datafiles/shutterstock"
    frame_prefix = "frames_midas"
    seq_prefix = "sequences_select_pairs_midas"

    def __init__(self, opt, mode="train", model=None):
        track = opt.track_id
        if track.isdigit():
            data_root = getattr(opt, "data_root", None) or self.data_root
            tracks = sorted(glob(join(data_root, self.frame_prefix, "*")))
            names = [t.split("/")[-1] for t in tracks]
            if names:
                opt.track_id = names[int(track) % len(names)]
        super().__init__(opt, mode, model)
