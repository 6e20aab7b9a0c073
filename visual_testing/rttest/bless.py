"""Blessing outputs as references (parity: visual-testing/src/rttest/bless.py).

--bless-all copies every produced output over its reference without review.
--bless opens an interactive matplotlib review per test (output vs current
reference vs abs-diff heatmap, exposure slider, y=accept / n=reject /
q=quit) and copies accepted outputs. References are local artifacts, not
version-controlled.
"""
from __future__ import annotations

import shutil
from pathlib import Path
from typing import List

from .diff import load_exr_channels
from .runner import TestResult


def bless_all(results: List[TestResult], reference_dir: Path) -> int:
    n = 0
    reference_dir.mkdir(parents=True, exist_ok=True)
    for res in results:
        if res.output_path is None:
            continue
        dst = reference_dir / f"{res.name}.exr"
        shutil.copyfile(res.output_path, dst)
        print(f"  blessed {res.name} -> {dst}")
        n += 1
    return n


def bless_interactive(results: List[TestResult], reference_dir: Path) -> int:
    try:
        import matplotlib

        matplotlib.use("TkAgg" if _has_display() else "Agg")
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Slider
    except Exception as e:
        print(f"matplotlib unavailable ({e}); falling back to --bless-all behavior")
        return bless_all(results, reference_dir)

    if not _has_display():
        print("no display; falling back to --bless-all behavior")
        return bless_all(results, reference_dir)

    import numpy as np

    n = 0
    for res in results:
        if res.output_path is None:
            continue
        _, out = load_exr_channels(Path(res.output_path))
        ref_path = reference_dir / f"{res.name}.exr"
        ref = None
        if ref_path.exists():
            _, ref = load_exr_channels(ref_path)

        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        fig.suptitle(f"{res.name} — y: accept · n: reject · q: quit")
        state = {"exposure": 1.0, "answer": None}

        def draw():
            e = state["exposure"]
            axes[0].imshow(np.clip(_rgb(out) * e, 0, 1))
            axes[0].set_title("output")
            if ref is not None:
                axes[1].imshow(np.clip(_rgb(ref) * e, 0, 1))
                axes[1].set_title("reference")
                d = np.abs(_rgb(out) - _rgb(ref)).sum(axis=-1)
                axes[2].imshow(d, cmap="inferno")
                axes[2].set_title("abs diff")
            fig.canvas.draw_idle()

        ax_slider = fig.add_axes([0.25, 0.02, 0.5, 0.03])
        slider = Slider(ax_slider, "exposure", 0.01, 1000.0, valinit=1.0)
        slider.on_changed(lambda v: (state.update(exposure=v), draw()))

        def on_key(event):
            if event.key in ("y", "n", "q"):
                state["answer"] = event.key
                plt.close(fig)

        fig.canvas.mpl_connect("key_press_event", on_key)
        draw()
        plt.show()

        if state["answer"] == "q":
            break
        if state["answer"] == "y":
            reference_dir.mkdir(parents=True, exist_ok=True)
            shutil.copyfile(res.output_path, ref_path)
            print(f"  blessed {res.name}")
            n += 1
    return n


def _rgb(a):
    import numpy as np

    if a.shape[-1] == 2:  # UV group
        return np.concatenate([a, np.zeros_like(a[..., :1])], axis=-1)
    return a


def _has_display() -> bool:
    import os

    return bool(os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY"))
