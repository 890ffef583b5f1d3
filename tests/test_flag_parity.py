"""CLI surface parity: every flag the reference accepts must exist here
(collected mechanically from both argparse trees)."""

import argparse
import os
import sys

import pytest

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not available"
)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def option_strings(parser):
    out = set()
    for action in parser._actions:
        out.update(action.option_strings)
    return out


@needs_reference
def test_train_flags_superset():
    import options.options_train as ref_opts
    from datasets.davis_sequence import Dataset as RefDs
    from models import scene_flow_motion_field as ref_model_mod

    ref_parser = argparse.ArgumentParser()
    ref_parser, _ = ref_opts.add_general_arguments(ref_parser)
    ref_parser, _ = RefDs.add_arguments(ref_parser)
    ref_parser, _ = ref_model_mod.Model.add_arguments(ref_parser)
    ref_flags = option_strings(ref_parser)

    from dynamic_video_depth_tpu.data.davis_sequence import Dataset
    from dynamic_video_depth_tpu.runtime import config
    from dynamic_video_depth_tpu.train.scene_flow_motion_field import Model

    ours = argparse.ArgumentParser()
    ours, _ = config.add_general_arguments(ours)
    ours, _ = Dataset.add_arguments(ours)
    ours, _ = Model.add_arguments(ours)
    our_flags = option_strings(ours)

    missing = sorted(ref_flags - our_flags)
    assert not missing, f"reference flags missing here: {missing}"
