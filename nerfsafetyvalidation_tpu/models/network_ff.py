"""Fully-fused-MLP backbone variant.

Parity target: reference nerf/network_ff.py — the same architecture as
nerf/network.py but with the FFMLP fused CUDA kernels and the color input
manually padded to 32 (= SH16 + geo15 + 1 zero pad, network_ff.py:42,
:67-68). On TPU the fused path is the pallas kernel in
ops/pallas/fused_mlp.py; padding to the 128-lane boundary happens inside the
kernel wrapper, so no manual pad is needed — the module simply forces
cfg.fused=True and bf16 compute (the reference forces fp16 off for ff,
validate.py:120-122; bf16 is the TPU-correct equivalent).
"""

import dataclasses

from ..config import NetworkConfig
from .network import NeRFNetwork


class NeRFNetworkFF(NeRFNetwork):
    def __init__(self, cfg: NetworkConfig):
        if cfg.bg_radius > 0:
            raise AssertionError(
                "background model is not implemented for --ff")
        cfg = dataclasses.replace(cfg, fused=True,
                                  compute_dtype="bfloat16")
        super().__init__(cfg)
