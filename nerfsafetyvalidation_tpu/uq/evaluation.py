"""UQ evaluation metrics: masked image metrics + classification metrics.

Parity targets: reference uncertainty/evaluation/metrics.py (accuracy/
precision/recall/F1, :4-20) and image_metrics.py (masked PSNR/SSIM/LPIPS
modules, :79-169). Image layout follows the reference: [bs, 3, H, W], mask
[bs, 1, H, W]. SSIM uses the dependency-free gaussian-window implementation
from train.metrics; LPIPS requires the optional lpips package.
"""

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------ classification (:4-20)
def calculate_accuracy(y_true, y_pred):
    return np.mean(np.asarray(y_true) == np.asarray(y_pred))


def calculate_precision(y_true, y_pred):
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    tp = np.sum((y_true == 1) & (y_pred == 1))
    fp = np.sum((y_true == 0) & (y_pred == 1))
    return tp / (tp + fp)


def calculate_recall(y_true, y_pred):
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    tp = np.sum((y_true == 1) & (y_pred == 1))
    fn = np.sum((y_true == 1) & (y_pred == 0))
    return tp / (tp + fn)


def calculate_f1_score(y_true, y_pred):
    precision = calculate_precision(y_true, y_pred)
    recall = calculate_recall(y_true, y_pred)
    return 2 * (precision * recall) / (precision + recall)


# ------------------------------------------------------- image metrics (:79+)
def masked_psnr(preds, target, mask=None):
    """preds/target: [bs, 3, H, W] in [0,1]; mask: [bs, 1, H, W] or None.
    Returns [bs] (image_metrics.py:79-105)."""
    preds = jnp.asarray(preds)
    target = jnp.asarray(target)
    bs = preds.shape[0]
    hw = preds.shape[2] * preds.shape[3]
    num = (preds.reshape(bs, 3, hw) - target.reshape(bs, 3, hw)) ** 2
    if mask is None:
        den = hw
    else:
        m = jnp.asarray(mask).reshape(bs, 1, hw)
        num = num * m
        den = m.sum(-1)
    mse = num.sum(-1) / den
    return (10 * jnp.log10(1.0 / mse)).mean(-1)


def _ssim_image(preds, target):
    """Per-pixel SSIM map [bs, H, W] averaged over channels (11x11 gaussian
    window, same constants as torchmetrics' SSIM)."""
    from ..train.metrics import _gaussian_kernel
    k = jnp.asarray(_gaussian_kernel(), dtype=jnp.float32)[None, None]

    def filt(x):  # x: [bs, 3, H, W]
        bs, c, h, w = x.shape
        out = jax.lax.conv_general_dilated(
            x.reshape(bs * c, 1, h, w), k, (1, 1), "SAME")
        return out.reshape(bs, c, h, w)

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu0, mu1 = filt(preds), filt(target)
    s00 = filt(preds * preds) - mu0 ** 2
    s11 = filt(target * target) - mu1 ** 2
    s01 = filt(preds * target) - mu0 * mu1
    ssim = ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / \
        ((mu0 ** 2 + mu1 ** 2 + c1) * (s00 + s11 + c2))
    return ssim.mean(1)


def masked_ssim(preds, target, mask=None):
    """image_metrics.py:107-136 semantics."""
    preds = jnp.asarray(preds)
    target = jnp.asarray(target)
    bs, _, h, w = preds.shape
    ssim_image = _ssim_image(preds, target)
    if mask is None:
        return ssim_image.reshape(bs, -1).mean(1)
    m = jnp.asarray(mask).reshape(bs, -1)
    den = m.sum(-1, keepdims=True)
    return (ssim_image.reshape(bs, -1) * m / den).sum(-1)


def masked_lpips(preds, target, mask=None):
    """image_metrics.py:138-169; needs the optional lpips package."""
    try:
        import lpips
        import torch
    except ImportError as e:
        raise ImportError("masked_lpips requires the 'lpips' package") from e
    fn = lpips.LPIPS(net="alex", spatial=True).eval()
    with torch.no_grad():
        lp = fn(torch.from_numpy(np.asarray(target)).float() * 2 - 1,
                torch.from_numpy(np.asarray(preds)).float() * 2 - 1)
    lp = lp.mean(1).numpy()  # [bs, H, W]
    bs = lp.shape[0]
    if mask is None:
        return lp.reshape(bs, -1).mean(1)
    m = np.asarray(mask).reshape(bs, -1)
    den = m.sum(-1, keepdims=True)
    return (lp.reshape(bs, -1) * m / den).sum(-1)


# reference metrics.py:22-30 wrappers
def calculate_psnr(preds, target, mask=None):
    return masked_psnr(preds, target, mask)


def calculate_ssim(preds, target, mask=None):
    return masked_ssim(preds, target, mask)


def calculate_lpips(preds, target, mask=None):
    return masked_lpips(preds, target, mask)
