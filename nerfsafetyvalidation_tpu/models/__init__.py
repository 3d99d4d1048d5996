"""NeRF networks + volume renderer (reference L2: nerf/network*.py, nerf/renderer.py)."""

from .network import NeRFNetwork
from .renderer import render, run, RendererState

__all__ = ["NeRFNetwork", "render", "run", "RendererState"]
