"""Data-layer behaviors: prefetch ordering, cache/overfit/repeat flags,
gap bucketing."""

import argparse

import pytest

from dynamic_video_depth_tpu.data import BatchLoader, DevicePrefetcher, get_dataset
from dynamic_video_depth_tpu.data.synthetic import make_track


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("data"))
    make_track(r, track="dog", n_frames=8, h=16, w=24, gaps=(1, 2))
    return r


def opt_for(root, **kw):
    base = dict(track_id="dog", gaps="1,2", repeat=1, subsample=False,
                cache=False, overfit=False, capat=1, select=False,
                data_root=root)
    base.update(kw)
    return argparse.Namespace(**base)


def test_loader_preserves_order(root):
    ds = get_dataset("davis_sequence")(opt_for(root))
    order = [3, 0, 2]
    seen = [i for i, _ in BatchLoader(ds, order)]
    assert seen == order


def test_prefetcher_yields_all(root):
    ds = get_dataset("davis_sequence")(opt_for(root))
    out = list(DevicePrefetcher(iter(BatchLoader(ds, range(4)))))
    assert [i for i, _, _ in out] == list(range(4))
    idx, dev, host = out[0]
    assert "pair_path" in host and "img_1" in dev


def test_repeat_and_overfit(root):
    ds = get_dataset("davis_sequence")(opt_for(root, repeat=3))
    assert len(ds) == 3 * len(ds.file_list)
    ds = get_dataset("davis_sequence")(opt_for(root, overfit=True, capat=2))
    a = ds[0]["frame_id_1"][0]
    b = ds[2]["frame_id_1"][0]  # idx 2 -> wraps to idx 0
    assert a == b


def test_gap_bucketing(root):
    ds = get_dataset("davis_sequence")(opt_for(root))
    gaps = {ds.gap_of(i) for i in range(len(ds.file_list))}
    assert gaps == {1, 2}
    for i in range(len(ds.file_list)):
        s = ds[i]
        assert int(s["frame_id_2"][0] - s["frame_id_1"][0]) == ds.gap_of(i)


def test_cache_hits(root):
    ds = get_dataset("davis_sequence")(opt_for(root, cache=True))
    a = ds[0]
    b = ds[0]
    assert a is b  # cached object identity
