"""NeRF networks + volume renderer (reference L2: nerf/network*.py, nerf/renderer.py)."""

from .network import NeRFNetwork
from .renderer import render, run, RendererState

__all__ = ["NeRFNetwork", "render", "run", "RendererState",
           "make_network"]


def make_network(cfg, opt=None):
    """Backbone dispatch for the entry points: --ff/--tcnn select the
    fused FFMLP topology (reference validate.py:120-129 import switch);
    encoding='mipfold' selects the flagship TPU mip-fold backbone."""
    if getattr(cfg, "encoding", None) == "mipfold":
        from .network_mip import NeRFNetworkMip
        return NeRFNetworkMip(cfg)
    if opt is not None and getattr(opt, "tcnn", False):
        from .network_tcnn import NeRFNetworkTCNN
        return NeRFNetworkTCNN(cfg)
    if opt is not None and getattr(opt, "ff", False):
        from .network_ff import NeRFNetworkFF
        return NeRFNetworkFF(cfg)
    return NeRFNetwork(cfg)
