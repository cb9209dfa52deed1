"""Image quality metrics (reference: src/image/metrics.zig).

SSIM uses the reference's 11x11 Gaussian window (sigma 1.5), Rec.709
luminance for RGB, and valid windowing; implemented as separable f32
convolutions on device (the reference accumulates in f64 on CPU — the
f32 device result agrees to ~1e-6, within the BASELINE float tolerance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim", "mean_pixel_error"]

_LUMA = (0.2126, 0.7152, 0.0722)


def luminance_plane(arr):
    """f32 [H,W] luminance 0-255 per metrics.zig getPixelScalar."""
    a = arr.astype(jnp.float32)
    if arr.shape[-1] == 1:
        return a[..., 0]
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    return (_LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b) / 255.0 * 255.0


def psnr(a, b):
    diff = a.astype(jnp.float32) - b.astype(jnp.float32)
    mse = jnp.mean(diff * diff)
    return jnp.where(
        mse == 0, jnp.inf, 20.0 * jnp.log10(255.0) - 10.0 * jnp.log10(mse)
    )


def _ssim_window_1d():
    x = np.arange(11, dtype=np.float64) - 5.0
    g = np.exp(-(x * x) / (2.0 * 1.5 * 1.5))
    # 2-D normalization identical to generateSsimWindow: the separable
    # outer product divided by the full 2-D sum
    return g / g.sum()


def _valid_sep_conv(img, k1d):
    """'valid' separable 11x11 convolution of [H, W] f32."""
    k = jnp.asarray(k1d, dtype=jnp.float32)
    n = img.shape[1] - 10
    acc = None
    for i in range(11):
        t = img[:, i:i + n] * k[i]
        acc = t if acc is None else acc + t
    m = img.shape[0] - 10
    out = None
    for i in range(11):
        t = acc[i:i + m] * k[i]
        out = t if out is None else out + t
    return out


@jax.jit
def ssim(a, b):
    """Mean SSIM over valid 11x11 windows; inputs u8 [H, W, C].

    Pixel values are centered on each image's global mean before the
    moment convolutions: window (co)variances are shift-invariant, and
    centering avoids the f32 cancellation in E[x^2] - E[x]^2 that
    otherwise keeps identical images from scoring exactly 1.0.
    """
    x = luminance_plane(a)
    y = luminance_plane(b)
    gx = jnp.mean(x)
    gy = jnp.mean(y)
    xc = x - gx
    yc = y - gy
    k1d = _ssim_window_1d()
    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    mu_xc = _valid_sep_conv(xc, k1d)
    mu_yc = _valid_sep_conv(yc, k1d)
    mu_x = mu_xc + gx
    mu_y = mu_yc + gy
    sigma_x = jnp.maximum(0.0, _valid_sep_conv(xc * xc, k1d) - mu_xc * mu_xc)
    sigma_y = jnp.maximum(0.0, _valid_sep_conv(yc * yc, k1d) - mu_yc * mu_yc)
    sigma_xy = _valid_sep_conv(xc * yc, k1d) - mu_xc * mu_yc
    num = (2.0 * mu_x * mu_y + c1) * (2.0 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def mean_pixel_error(a, b):
    diff = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
    return jnp.mean(diff) / 255.0
