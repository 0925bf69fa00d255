"""Image metrics: PSNR and SSIM in pure jnp (reference: metrics.py:25-58 —
skimage PSNR with data_range=1 and SSIM win=11 gaussian, kornia GPU variants).

The SSIM here follows the standard Wang et al. formulation with an 11x11
Gaussian window (sigma 1.5), matching skimage's
`structural_similarity(..., gaussian_weights=True, sigma=1.5,
use_sample_covariance=False, data_range=1)` — the configuration the
reference uses for its reported numbers.
"""

import numpy as np
import jax
import jax.numpy as jnp


def psnr(img, gt, data_range=1.0):
    """Peak signal-to-noise ratio over whole images [H, W, C]."""
    mse = jnp.mean((img - gt) ** 2)
    return 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


_SSIM_KERNEL = _gaussian_kernel()


def _filter2(img, kernel):
    """Depthwise 'valid' 2D convolution over [H, W, C]."""
    k = kernel[:, :, None, None]
    img_nchw = jnp.transpose(img, (2, 0, 1))[:, None]  # [C, 1, H, W]
    out = jax.lax.conv_general_dilated(
        img_nchw, k, (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return jnp.transpose(out[:, 0], (1, 2, 0))


def ssim(img, gt, data_range=1.0):
    """SSIM over [H, W, C] images; mean over valid windows and channels."""
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    k = _SSIM_KERNEL
    mu_x = _filter2(img, k)
    mu_y = _filter2(gt, k)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x2 = _filter2(img * img, k) - mu_x2
    sigma_y2 = _filter2(gt * gt, k) - mu_y2
    sigma_xy = _filter2(img * gt, k) - mu_xy
    num = (2 * mu_xy + C1) * (2 * sigma_xy + C2)
    den = (mu_x2 + mu_y2 + C1) * (sigma_x2 + sigma_y2 + C2)
    return jnp.mean(num / den)


def get_mean_outputs(outputs_list):
    """Aggregate a list of per-image metric dicts into means
    (reference metrics.py:60-93)."""
    if not outputs_list:
        return {}
    keys = outputs_list[0].keys()
    return {k: float(np.mean([float(o[k]) for o in outputs_list]))
            for k in keys}
