"""Async batch visualizer (reference: visualize/html_visualizer.py:24-120 +
util/util_visualize.py routing).

Routes tensors by key substring — 'depth' -> turbo inverse-depth, 'flow' ->
Middlebury wheel, 'img' -> passthrough RGB — writes PNGs on a worker pool
(threads: PNG encoding releases the GIL inside PIL) and appends rows to a
per-epoch HTML table."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from os.path import join
from typing import Dict, Optional

import numpy as np

from .colormap import depth_to_image
from .flow_viz import flow_to_image
from .html import ImageTable


def convert_for_display(key: str, value: np.ndarray) -> Optional[np.ndarray]:
    """Key-substring routing (reference: util/util_visualize.py:17,30-120)."""
    v = np.asarray(value)
    # drop batch dim
    if v.ndim >= 4:
        v = v[0]
    if "depth" in key:
        if v.ndim == 3:
            v = v[..., 0] if v.shape[-1] == 1 else v[0]
        return depth_to_image(v)
    if "flow" in key and v.ndim == 3 and v.shape[-1] == 2:
        return flow_to_image(v)
    if "img" in key:
        if v.ndim == 3 and v.shape[-1] == 3:
            return (np.clip(v, 0, 1) * 255).astype(np.uint8)
        if v.ndim == 3 and v.shape[0] == 3:
            return (np.clip(v.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
    return None


def _write_png(path: str, arr: np.ndarray):
    from PIL import Image

    Image.fromarray(arr).save(path)


class HTMLVisualizer:
    """Async visualization writer.

    One accumulated page per output directory (= per epoch), a row per
    visualized batch, columns = image-routable keys — the reference's
    eyeball-QA workflow (reference: visualize/html_visualizer.py:63-120
    ``prepare_HTML_string`` accumulates ``<tr>`` rows into the epoch page).
    The page is rewritten after every batch so it is always current, even if
    the run dies mid-epoch."""

    def __init__(self, n_workers: int = 4):
        self.pool = ThreadPoolExecutor(max_workers=n_workers)
        self._pending = []
        self._tables: Dict[str, ImageTable] = {}

    def visualize(self, pack: Dict[str, np.ndarray], idx: int, outdir: str):
        os.makedirs(outdir, exist_ok=True)
        written = {}
        for key, value in pack.items():
            if not isinstance(value, np.ndarray):
                continue
            img = convert_for_display(key, value)
            if img is None:
                continue
            fname = f"batch{idx:04d}_{key}.png"
            self._pending.append(
                self.pool.submit(_write_png, join(outdir, fname), img)
            )
            written[key] = fname
        if written:
            table = self._tables.get(outdir)
            if table is None:
                table = ImageTable(title=os.path.basename(outdir))
                table.set_header(["batch"] + sorted(written))
                self._tables[outdir] = table
            # cells follow the TABLE's header, not this batch's key set — a
            # batch that routes extra/missing keys must not shift columns
            table.add_row(
                [f"{idx:04d}"]
                + [written.get(k, "") for k in table.header[1:]]
            )
            table.save(join(outdir, "index.html"))
        return sorted(written.values())

    def flush(self):
        for f in self._pending:
            f.result()
        self._pending = []

    def close(self):
        self.flush()
        self.pool.shutdown()
