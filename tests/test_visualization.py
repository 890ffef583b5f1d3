"""Visualization utility tests: flow wheel, depth colormap, converters,
HTML builders, async visualizer."""

import os

import numpy as np

from dynamic_video_depth_tpu.utils.colormap import depth_to_image, normalize01
from dynamic_video_depth_tpu.utils.flow_viz import flow_to_image
from dynamic_video_depth_tpu.utils.html import ImageTable, Webpage
from dynamic_video_depth_tpu.utils.visualizer import (
    HTMLVisualizer,
    convert_for_display,
)


def test_flow_to_image_properties(rng):
    flow = rng.randn(16, 20, 2).astype(np.float32) * 3
    img = flow_to_image(flow)
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8
    # zero flow renders white-ish (center of the wheel)
    img0 = flow_to_image(np.zeros((4, 4, 2), np.float32), max_flow=1.0)
    assert img0.min() > 220
    # opposite directions get different colors
    r = flow_to_image(np.tile([5.0, 0.0], (4, 4, 1)).astype(np.float32), 5.0)
    l = flow_to_image(np.tile([-5.0, 0.0], (4, 4, 1)).astype(np.float32), 5.0)
    assert np.abs(r.astype(int) - l.astype(int)).max() > 50


def test_depth_to_image(rng):
    d = 1 + rng.rand(12, 15).astype(np.float32) * 4
    img = depth_to_image(d)
    assert img.shape == (12, 15, 3) and img.dtype == np.uint8
    n = normalize01(d)
    assert 0.0 <= n.min() and n.max() <= 1.0


def test_convert_for_display_routing(rng):
    assert convert_for_display("depth", rng.rand(1, 8, 9).astype(np.float32)).shape == (8, 9, 3)
    assert convert_for_display("flow_1_2", rng.rand(1, 8, 9, 2).astype(np.float32)).shape == (8, 9, 3)
    assert convert_for_display("img_1", rng.rand(1, 8, 9, 3).astype(np.float32)).shape == (8, 9, 3)
    assert convert_for_display("K", rng.rand(3, 3).astype(np.float32)) is None


def test_visualizer_writes_pngs(tmp_path, rng):
    vis = HTMLVisualizer(n_workers=2)
    pack = {
        "depth": rng.rand(1, 8, 9).astype(np.float32) + 1,
        "flow_1_2": rng.randn(1, 8, 9, 2).astype(np.float32),
        "img_1": rng.rand(1, 8, 9, 3).astype(np.float32),
        "pair_path": "ignored",
    }
    written = vis.visualize(pack, 3, str(tmp_path))
    written5 = vis.visualize(pack, 5, str(tmp_path))
    vis.close()
    assert len(written) == 3 and len(written5) == 3
    for f in written + written5:
        assert os.path.isfile(tmp_path / f)
    # one accumulated page per epoch dir: a row per batch (reference:
    # visualize/html_visualizer.py:63-120)
    html = open(tmp_path / "index.html").read()
    assert "batch0003_depth.png" in html and "batch0005_depth.png" in html
    assert html.count("<tr>") == 3  # header + 2 batch rows


def test_html_builders(tmp_path):
    web = Webpage()
    web.add_video("a.mp4", title="vid")
    web.add_image("b.png", title="img")
    web.add_text("hello")
    web.save(str(tmp_path / "page.html"))
    html = open(tmp_path / "page.html").read()
    assert "a.mp4" in html and "b.png" in html and "hello" in html

    table = ImageTable()
    table.set_header(["x"])
    table.add_row(["c.png", "text"])
    table.save(str(tmp_path / "t.html"))
    assert "c.png" in open(tmp_path / "t.html").read()


def test_flo_roundtrip(tmp_path, rng):
    """Middlebury .flo write/read round-trip + binary layout matching the
    reference's readFlow (reference: util/util_flow.py:22-73)."""
    from dynamic_video_depth_tpu.utils.flow_io import read_flo, write_flo

    flow = rng.randn(6, 9, 2).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_array_equal(back, flow)

    raw = open(p, "rb").read()
    assert np.frombuffer(raw[:4], "<f4")[0] == 202021.25
    assert np.frombuffer(raw[4:12], "<i4").tolist() == [9, 6]

    # the reference's own reader parses our files when available
    import os, sys
    if os.path.isdir("/root/reference"):
        sys.path.insert(0, "/root/reference")
        try:
            from util.util_flow import readFlow
            np.testing.assert_array_equal(readFlow(p), flow)
        finally:
            sys.path.remove("/root/reference")

    import pytest as _pytest
    with _pytest.raises(ValueError):
        bad = str(tmp_path / "bad.flo")
        open(bad, "wb").write(b"\x00" * 12)
        read_flo(bad)
