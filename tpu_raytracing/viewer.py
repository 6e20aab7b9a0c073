"""Interactive render viewer (parity: crates/viewer — wgpu/imgui app).

The reference viewer runs the CPU backend synchronously on a scene, streams
radiance into a storage buffer, tonemaps in a WGSL compute pass with
exposure/gamma push constants, and offers imgui controls (spp, depth,
debug normals, pixel inspect) (render_output_view.rs:13-97). The TPU-native
equivalent keeps the same capabilities on a matplotlib canvas:

- renders through the same device renderer as the CLI
- PROGRESSIVE refinement: samples accumulate in spp chunks and the canvas
  updates live after every chunk (render_output_view.rs:84-97 re-render
  loop; uses integrator.accumulate's on_chunk hook)
- exposure + gamma sliders re-tonemap without re-rendering
- 'n' toggles the normals AOV view, 'r' re-renders, 'q' quits
- clicking a pixel replays its sampler streams and prints the
  SinglePixelOutput diagnostics (viewer pixel-inspect equivalent)

Headless (no DISPLAY): renders once and writes a tonemapped PNG.

Usage: python -m tpu_raytracing.viewer --scene-name sphere [-s N] [-d N]
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

log = logging.getLogger("tpu_raytracing")


def _tonemap(rgb: np.ndarray, exposure: float, gamma: float) -> np.ndarray:
    x = np.clip(rgb * exposure, 0.0, 1.0)
    return x ** (1.0 / max(gamma, 1e-3))


def run_viewer(scene, settings, scene_name: str = "scene") -> None:
    from .integrator.accumulate import render_accumulated
    from .integrator.render import render, render_single_pixel
    from .settings import AovFlags

    settings.outputs = AovFlags.BEAUTY | AovFlags.NORMALS
    state = {"exposure": 1.0, "gamma": 2.2, "show_normals": False}

    import copy

    def do_render(on_chunk=None):
        # normals AOV is a cheap single first-hit pass
        aov_settings = copy.copy(settings)
        aov_settings.outputs = AovFlags.NORMALS
        state["normals"] = (render(scene, aov_settings).normals + 1.0) * 0.5
        # beauty accumulates progressively in spp chunks
        beauty_settings = copy.copy(settings)
        beauty_settings.outputs = AovFlags.BEAUTY
        out = render_accumulated(
            scene, beauty_settings,
            spp_chunk=max(1, settings.samples_per_pixel // 8),
            on_chunk=on_chunk,
        )
        state["beauty"] = out.beauty

    headless = not (os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY"))
    if headless:
        from .utils.png import save_png

        do_render()
        path = f"{scene_name}_view.png"
        save_png(path, state["beauty"], exposure=state["exposure"])
        log.info("headless: wrote %s", path)
        return

    import matplotlib

    matplotlib.use("TkAgg")
    import matplotlib.pyplot as plt
    from matplotlib.widgets import Slider

    fig, ax = plt.subplots(figsize=(10, 7))
    fig.subplots_adjust(bottom=0.18)
    fig.canvas.manager.set_window_title(f"tpu-raytracing viewer — {scene_name}")
    cam = scene.camera
    placeholder = np.zeros((cam.raster_height, cam.raster_width, 3))
    im = ax.imshow(placeholder)
    title = "click: pixel inspect · n: normals · r: re-render · q: quit"
    ax.set_title(title)

    ax_exp = fig.add_axes([0.15, 0.08, 0.6, 0.03])
    ax_gam = fig.add_axes([0.15, 0.03, 0.6, 0.03])
    s_exp = Slider(ax_exp, "exposure", 0.001, 1000.0, valinit=1.0)
    s_gam = Slider(ax_gam, "gamma", 1.0, 3.0, valinit=2.2)

    def redraw(_=None):
        img = (
            state["normals"]
            if state["show_normals"]
            else _tonemap(state["beauty"], s_exp.val, s_gam.val)
        )
        im.set_data(np.clip(img, 0, 1))
        fig.canvas.draw_idle()

    s_exp.on_changed(redraw)
    s_gam.on_changed(redraw)

    def progressive(img, spp_done):
        """Live canvas update after each accumulated spp chunk."""
        state["beauty"] = img
        ax.set_title(f"{title}   [{spp_done}/{settings.samples_per_pixel} spp]")
        redraw()
        plt.pause(0.001)

    def on_key(event):
        if event.key == "n":
            state["show_normals"] = not state["show_normals"]
            redraw()
        elif event.key == "r":
            do_render(on_chunk=progressive)
            redraw()
        elif event.key == "q":
            plt.close(fig)

    def on_click(event):
        if event.inaxes is not ax or event.xdata is None:
            return
        x, y = int(event.xdata), int(event.ydata)
        for o in render_single_pixel(scene, settings, x, y, sample_count=1):
            print(
                f"pixel ({x}, {y}) sample {o.sample_index}: hit={o.hit} "
                f"uv=({o.uv[0]:.4f}, {o.uv[1]:.4f}) "
                f"normal=({o.normal[0]:.3f}, {o.normal[1]:.3f}, {o.normal[2]:.3f}) "
                f"radiance=({o.radiance[0]:.4f}, {o.radiance[1]:.4f}, "
                f"{o.radiance[2]:.4f})"
            )

    fig.canvas.mpl_connect("key_press_event", on_key)
    fig.canvas.mpl_connect("button_press_event", on_click)
    fig.show()
    do_render(on_chunk=progressive)  # first render refines live
    redraw()
    plt.show()


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    p = argparse.ArgumentParser(prog="tpu-raytracing-viewer")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--scene-path")
    g.add_argument("--scene-name")
    p.add_argument("-s", "--spp", type=int, default=8)
    p.add_argument("-d", "--ray-depth", type=int, default=4)
    p.add_argument("--backend", choices=["jax", "cpu", "tpu"], default="jax")
    args = p.parse_args(argv)

    from .cli import _select_platform

    _select_platform(args.backend)

    from .settings import RaytracerSettings

    if args.scene_path:
        from .scene.loaders import scene_from_file

        scene = scene_from_file(args.scene_path)
        name = args.scene_path
        settings = RaytracerSettings()
    else:
        from .scene.test_scenes import get_test_scene

        ts = get_test_scene(args.scene_name)
        scene = ts.scene_func()
        settings = ts.settings_func()
        name = args.scene_name
    settings.samples_per_pixel = args.spp
    settings.max_ray_depth = args.ray_depth
    run_viewer(scene, settings, name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
