from .render import render, render_single_pixel

__all__ = ["render", "render_single_pixel"]
