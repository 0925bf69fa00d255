"""LPIPS perceptual metric (reference metrics.py:54-58 — the `lpips`
package with net='vgg').

This environment has zero egress, so the pretrained VGG16 backbone and the
LPIPS linear-head weights cannot be downloaded (DATASETS.md). The FULL
compute graph ships here and lights up the moment a weight file exists:
set `HYPERREEL_LPIPS_WEIGHTS` (or cfg `params.lpips_weights`) to a `.npz`
with the schema below, or convert the torch checkpoints with
`convert_torch_weights`.

npz schema
----------
  conv_{i}_w : [kh, kw, cin, cout] f32   (HWIO; i = 0..12, VGG16 convs)
  conv_{i}_b : [cout] f32
  lin_{k}_w  : [c_k] f32                 (k = 0..4, the LPIPS 1x1 heads,
                                          non-negative per-channel weights)

Forward (matches the lpips package's LPIPS(net='vgg') eval path):
  inputs in [0, 1] -> scaled to [-1, 1] -> per-channel shift/scale ->
  VGG16 conv stack, taps at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 ->
  channelwise unit-normalize each tap -> squared difference ->
  per-channel lin weights -> spatial mean -> sum over taps.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

# VGG16 conv plan: output channels per conv, `None` marks 2x2 max-pool
_VGG_PLAN = [64, 64, None, 128, 128, None, 256, 256, 256, None,
             512, 512, 512, None, 512, 512, 512]
# conv indices (0-based over convs only) after whose relu LPIPS taps
_TAPS = {1, 3, 6, 9, 12}

# lpips package ScalingLayer constants
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def default_weights_path(cfg_params=None):
    p = (cfg_params or {}).get("lpips_weights") if cfg_params else None
    return p or os.environ.get("HYPERREEL_LPIPS_WEIGHTS")


def load_weights(path):
    """Load the npz schema into a params dict of jnp arrays."""
    data = np.load(path)
    params = {k: jnp.asarray(data[k]) for k in data.files}
    n_convs = sum(1 for c in _VGG_PLAN if c is not None)
    for i in range(n_convs):
        assert f"conv_{i}_w" in params, f"missing conv_{i}_w in {path}"
    for k in range(len(_TAPS)):
        assert f"lin_{k}_w" in params, f"missing lin_{k}_w in {path}"
    return params


def _conv(x, w, b):
    """NCHW conv, stride 1, SAME-1 padding (VGG uses pad=1 3x3)."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return out + b[None, :, None, None]


def _vgg_taps(params, x):
    """x: [N, 3, H, W] normalized. Returns the 5 tapped feature maps."""
    taps = []
    ci = 0
    for spec in _VGG_PLAN:
        if spec is None:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
            continue
        x = _conv(x, params[f"conv_{ci}_w"], params[f"conv_{ci}_b"])
        x = jnp.maximum(x, 0.0)
        if ci in _TAPS:
            taps.append(x)
        ci += 1
    return taps


def lpips(params, img0, img1):
    """LPIPS distance between [H, W, 3] images in [0, 1]."""
    def prep(im):
        x = im * 2.0 - 1.0
        x = (x - _SHIFT) / _SCALE
        return jnp.transpose(x, (2, 0, 1))[None]  # [1, 3, H, W]

    t0 = _vgg_taps(params, prep(img0))
    t1 = _vgg_taps(params, prep(img1))
    total = 0.0
    for k, (a, b) in enumerate(zip(t0, t1)):
        na = a * jax.lax.rsqrt(jnp.sum(a * a, 1, keepdims=True) + 1e-10)
        nb = b * jax.lax.rsqrt(jnp.sum(b * b, 1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2                              # [1, C, H, W]
        w = params[f"lin_{k}_w"][None, :, None, None]
        total = total + jnp.mean(jnp.sum(d * w, 1))
    return total


def convert_torch_weights(vgg_state, lin_state, out_path):
    """Convert torchvision VGG16 (`features.{n}.weight/bias`) + the lpips
    package's linear heads (`lin{k}.model.1.weight`, [1, C, 1, 1]) into
    the npz schema. Accepts dicts of torch tensors or numpy arrays."""
    def tonp(t):
        try:
            return t.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(t)

    out = {}
    ci = 0
    feat_idx = 0
    for spec in _VGG_PLAN:
        if spec is None:
            feat_idx += 1  # the pool layer
            continue
        w = tonp(vgg_state[f"features.{feat_idx}.weight"])  # [co, ci, kh, kw]
        b = tonp(vgg_state[f"features.{feat_idx}.bias"])
        out[f"conv_{ci}_w"] = np.ascontiguousarray(
            w.transpose(2, 3, 1, 0)).astype(np.float32)
        out[f"conv_{ci}_b"] = b.astype(np.float32)
        ci += 1
        feat_idx += 2  # conv + relu
    for k in range(len(_TAPS)):
        lw = tonp(lin_state[f"lin{k}.model.1.weight"])
        out[f"lin_{k}_w"] = lw.reshape(-1).astype(np.float32)
    np.savez(out_path, **out)
    return out_path
