"""Training losses.

Parity target: reference loss.py — `mape_loss` (:7), `huber_loss` (:18), and
the O(N) efficient distortion loss `EffDistLoss` (:30-76). The distortion
loss is implemented with prefix sums; jax autodiff reproduces the closed-form
backward of the reference (loss.py:62-75) automatically.
"""

import jax.numpy as jnp


def mape_loss(pred, target, reduction: str = "mean"):
    difference = jnp.abs(pred - target)
    scale = 1.0 / (jnp.abs(target) + 1e-2)
    loss = difference * scale
    if reduction == "mean":
        loss = jnp.mean(loss)
    return loss


def huber_loss(pred, target, delta: float = 0.1, reduction: str = "mean"):
    rel = jnp.abs(pred - target)
    sqr = 0.5 / delta * rel * rel
    loss = jnp.where(rel > delta, rel - 0.5 * delta, sqr)
    if reduction == "mean":
        loss = jnp.mean(loss)
    return loss


def eff_distloss(w, m, interval):
    """Efficient O(N) distortion loss. w, m: [B, N]; interval: scalar or [B, N]."""
    n_rays = int(jnp.size(w) // w.shape[-1]) if w.ndim > 1 else 1
    wm = w * m
    w_cumsum = jnp.cumsum(w, axis=-1)
    wm_cumsum = jnp.cumsum(wm, axis=-1)
    w_prefix = jnp.concatenate(
        [jnp.zeros_like(w_cumsum[..., :1]), w_cumsum[..., :-1]], axis=-1)
    wm_prefix = jnp.concatenate(
        [jnp.zeros_like(wm_cumsum[..., :1]), wm_cumsum[..., :-1]], axis=-1)
    loss_uni = (1.0 / 3.0) * interval * w ** 2
    loss_bi = 2.0 * w * (m * w_prefix - wm_prefix)
    return (jnp.sum(loss_bi) + jnp.sum(loss_uni)) / n_rays
