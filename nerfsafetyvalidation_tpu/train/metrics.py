"""Evaluation metrics.

Parity targets: reference nerf/utils.py PSNRMeter (:185-219) and LPIPSMeter
(:221-255). LPIPS needs pretrained perceptual nets which are unavailable in a
hermetic environment, so LPIPSMeter degrades to a clearly-flagged no-op
unless the `lpips` package is importable. A dependency-free SSIM (gaussian
window, standard constants) is provided for the UQ evaluation module.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp


class PSNRMeter:
    def __init__(self):
        self.V = 0.0
        self.N = 0

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds, truths):
        preds = np.asarray(preds)
        truths = np.asarray(truths)
        psnr = -10.0 * np.log10(np.mean((preds - truths) ** 2))
        self.V += psnr
        self.N += 1

    def measure(self):
        return self.V / max(self.N, 1)

    def write(self, writer, global_step, prefix=""):
        writer.add_scalar(os.path.join(prefix, "PSNR"), self.measure(),
                          global_step)

    def report(self):
        return f"PSNR = {self.measure():.6f}"


class LPIPSMeter:
    """Perceptual metric; functional only when the lpips package (and its
    pretrained weights) are available. Mirrors utils.py:221-255."""

    def __init__(self, net="alex", device=None):
        self.V = 0.0
        self.N = 0
        self.net = net
        try:
            import lpips  # noqa: F401
            import torch
            self._torch = torch
            self.fn = lpips.LPIPS(net=net).eval()
            self.available = True
        except Exception:
            self.fn = None
            self.available = False

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds, truths):
        if not self.available:
            return
        torch = self._torch
        p = torch.from_numpy(np.asarray(preds)).permute(0, 3, 1, 2).contiguous()
        t = torch.from_numpy(np.asarray(truths)).permute(0, 3, 1, 2).contiguous()
        self.V += self.fn(t, p, normalize=True).item()
        self.N += 1

    def measure(self):
        if not self.available:
            return float("nan")
        return self.V / max(self.N, 1)

    def write(self, writer, global_step, prefix=""):
        writer.add_scalar(os.path.join(prefix, f"LPIPS ({self.net})"),
                          self.measure(), global_step)

    def report(self):
        if not self.available:
            return "LPIPS unavailable (lpips package not installed)"
        return f"LPIPS ({self.net}) = {self.measure():.6f}"


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def ssim(img0, img1, max_val: float = 1.0):
    """Structural similarity between two [H, W, C] images (standard Wang et
    al. constants, 11x11 gaussian window)."""
    img0 = jnp.asarray(img0, dtype=jnp.float32)
    img1 = jnp.asarray(img1, dtype=jnp.float32)
    if img0.ndim == 2:
        img0 = img0[..., None]
        img1 = img1[..., None]
    k = jnp.asarray(_gaussian_kernel(), dtype=jnp.float32)[..., None, None]

    def filt(x):
        # depthwise conv per channel
        x = jnp.moveaxis(x, -1, 0)[:, None]  # [C,1,H,W]
        out = jax.lax.conv_general_dilated(
            x, jnp.broadcast_to(k[..., 0, 0][None, None], (1, 1, 11, 11)),
            (1, 1), "VALID")
        return jnp.moveaxis(out[:, 0], 0, -1)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu0, mu1 = filt(img0), filt(img1)
    s00 = filt(img0 * img0) - mu0 * mu0
    s11 = filt(img1 * img1) - mu1 * mu1
    s01 = filt(img0 * img1) - mu0 * mu1
    num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
    den = (mu0 ** 2 + mu1 ** 2 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)
