"""Hierarchical importance sampling (inverse-CDF).

Parity target: reference nerf/renderer.py:12-46 (`sample_pdf`), the standard
NeRF implementation: build a CDF over bin weights (+1e-5), draw uniform (or
deterministic midpoints) samples, invert by searchsorted, lerp within bins.
"""

import jax
import jax.numpy as jnp


def sample_pdf(bins, weights, n_samples: int, det: bool = False, key=None):
    """bins: [B, T] z-value midpoints; weights: [B, T-1]. Returns [B, n_samples]."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, T]

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        if key is None:
            raise ValueError("sample_pdf with det=False requires a PRNG key")
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
