"""Volume-rendering transmittance compositing.

Parity target: the exclusive-cumprod compositing in reference
nerf/renderer.py:206-230 (torch path) and the streaming recurrence in
raymarching.cu:545-572. Both compute

  alpha_i   = 1 - exp(-delta_i * density_scale * sigma_i)
  T_i       = prod_{j<i} (1 - alpha_j + 1e-15)
  weight_i  = alpha_i * T_i

and reduce weights against rgbs / z / sigma to image / depth /
aggregated_density. On TPU this is a fixed-shape cumulative product over the
sample axis — XLA lowers it to a parallel scan; no ray compaction needed.
"""

import jax.numpy as jnp


def composite_weights(sigmas, deltas, density_scale: float = 1.0):
    """sigmas, deltas: [N, T] -> weights [N, T] and alphas [N, T]."""
    alphas = 1.0 - jnp.exp(-deltas * density_scale * sigmas)
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-15], axis=-1)
    trans = jnp.cumprod(shifted, axis=-1)[..., :-1]  # exclusive product
    return alphas * trans, alphas


def composite_rays(sigmas, rgbs, deltas, z_vals, nears, fars,
                   density_scale: float = 1.0):
    """Full composite: returns dict with weights, weights_sum, depth (normalized
    to [0,1] like renderer.py:226-227), image (pre-background), and
    aggregated_density = sum_i w_i * sigma_i (renderer.py:244)."""
    weights, _ = composite_weights(sigmas, deltas, density_scale)
    weights_sum = jnp.sum(weights, axis=-1)
    ori_z = jnp.clip((z_vals - nears[..., None]) /
                     (fars[..., None] - nears[..., None]), 0.0, 1.0)
    depth = jnp.sum(weights * ori_z, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)
    aggregated_density = jnp.sum(weights * sigmas, axis=-1)
    return {
        "weights": weights,
        "weights_sum": weights_sum,
        "depth": depth,
        "image": image,
        "aggregated_density": aggregated_density,
    }
