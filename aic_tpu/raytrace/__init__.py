"""Layer 2a: raytrace rendering (reference: all-is-cubes-render)."""

from .camera import Camera, Viewport, look_at_transform
from .options import GraphicsOptions
from .render import Rendering, print_space_ascii, render, render_hdr, save_png
from .tracer import trace_rays

__all__ = [
    "Camera",
    "GraphicsOptions",
    "Rendering",
    "Viewport",
    "look_at_transform",
    "print_space_ascii",
    "render",
    "render_hdr",
    "save_png",
    "trace_rays",
]
