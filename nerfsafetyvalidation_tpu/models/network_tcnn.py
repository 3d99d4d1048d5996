"""tiny-cuda-nn backbone variant (CLI parity).

Parity target: reference nerf/network_tcnn.py — the same NeRF wired through
the external tiny-cuda-nn library's encoders/MLPs. tiny-cuda-nn is a
CUDA-only dependency; on TPU its role (fused hash encode + fused MLP) is
exactly the pallas/cell-layout fast path, so this module is an alias of the
fused backbone. `--tcnn` on any entry point resolves here and behaves like
`--ff` (same architecture, same kernels).
"""

from .network_ff import NeRFNetworkFF as NeRFNetworkTCNN

NeRFNetwork = NeRFNetworkTCNN
