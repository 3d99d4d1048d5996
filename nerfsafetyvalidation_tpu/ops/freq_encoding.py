"""NeRF frequency (positional) encoding.

Parity target: reference freqencoder/src/freqencoder.cu (`kernel_freq`,
:30-58): output layout is [x_0..x_{D-1}, then for col in 0..2*deg-1 the block
sin(2^(col//2) * x_d + (col%2) * pi/2) for every input dim d]. Even columns
are sines, odd columns are cosines (sin shifted by pi/2). Autodiff supplies
the backward pass (kernel_freq_backward is the analytic equivalent).

Pure jnp: this is a handful of VPU transcendentals which XLA fuses into the
surrounding network; no Pallas kernel is warranted.
"""

import numpy as np
import jax.numpy as jnp


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + input_dim * 2 * degree


def freq_encode(x, degree: int):
    """x: [..., D] -> [..., D + D*2*degree]."""
    freqs = np.exp2(np.arange(degree)).astype(np.float32)  # [deg]
    # cols: for each freq, (sin, cos); layout matches the CUDA kernel:
    # col = 0 -> sin(2^0 x), col = 1 -> cos(2^0 x), col = 2 -> sin(2^1 x) ...
    scaled = x[..., None, :] * jnp.asarray(freqs)[:, None]  # [..., deg, D]
    sins = jnp.sin(scaled)
    coss = jnp.cos(scaled)
    inter = jnp.stack([sins, coss], axis=-2)  # [..., deg, 2, D]
    inter = inter.reshape(x.shape[:-1] + (2 * degree * x.shape[-1],))
    return jnp.concatenate([x, inter], axis=-1)
