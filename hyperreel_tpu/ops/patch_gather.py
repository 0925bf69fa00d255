"""Coherent patch-gather: one gathered row serves an R-ray block.

The per-ROW gather floor (~557M rows/s on v5e, PERFORMANCE.md) is the
flagship eval's dominant cost; the only route under it is a
coherence-exploiting table redesign (PERFORMANCE.md round-3b). Rays
rendered in frame scanline order are spatially coherent: measured
texel spreads across R consecutive rays at the same sorted sample slot
are tiny (exp_patch_coverage.py: p99.9 <= 1.3 texels at R=4 even on a
512 grid), so ONE (px x py)-texel patch row anchored at the block
minimum serves all R rays' bilinear lookups:

  rows gathered: N -> N / R
  bytes / sample: 4C*2 (quad) -> px*py*C*2 / R  (px=4, py=2, R=4: half)

Semantics match ``grid_sample_2d_cf_quad`` (align_corners=True, zero
padding) EXACTLY whenever each ray's 2x2 footprint fits its block's
patch, and degrade gracefully (hat weights vanish -> zero features,
identical to far-out-of-range zero padding) when it does not. Coverage
is geometry-dependent; render paths log the measured violation rate.

Reference behavior being accelerated: the space-plane grid_sample of
tensor_vm_split_time / no_sample (reference nlf/nets/tensorf_*.py,
F.grid_sample align_corners=True zero padding). Eval-only: training
keeps the exact quad path (this table has no VJP).

Layout notes (TPU):
  * the patch table is row-major [(H+1)*(W+1), px*py*C] with texel t =
    ty*px + tx channel-major inside the row — the shade kernel reads
    rows transposed to [P*C, blk] and blends with iota-built hat
    weights;
  * anchors are per (block, slot); offsets (u, v) are per sample and
    ride the scalar pack.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _unnormalize(coord, size):
    # align_corners=True (mirrors ops/grid_sample.py)
    return (coord + 1.0) * 0.5 * (size - 1)


def build_patch_table_2d(grid_hwc, px=4, py=2):
    """[(H+1)*(W+1), px*py*C] patch rows from a [H, W, C] plane.

    Row (y0+1)*(W+1) + (x0+1) holds texels (y0+ty, x0+tx) for
    ty < py, tx < px, zero outside the plane (matching the quad table's
    zero ring); anchors x0 in [-1, W-1], y0 in [-1, H-1]. Texels are
    laid out t-major: row[:, (ty*px+tx)*C : +C] = plane[y0+ty, x0+tx].
    """
    H, W, C = grid_hwc.shape
    p = jnp.pad(grid_hwc, ((1, py - 1), (1, px - 1), (0, 0)))
    tiles = [p[ty:ty + H + 1, tx:tx + W + 1]
             for ty in range(py) for tx in range(px)]
    pack = jnp.concatenate(tiles, -1)          # [H+1, W+1, px*py*C]
    return pack.reshape((H + 1) * (W + 1), px * py * C)


def patch_anchors_2d(x, y, R, W, H, px=4, py=2):
    """Block anchors + per-sample in-patch offsets.

    x, y: unnormalized texel coords, shape [N] with rays grouped in
    R-consecutive blocks (N % R == 0). Returns (idx [N // R] int32 rows
    into the patch table, u [N], v [N] in-patch offsets).
    """
    n = x.shape[0]
    x0 = jnp.clip(jnp.floor(x.reshape(n // R, R).min(-1)), -1, W - 1)
    y0 = jnp.clip(jnp.floor(y.reshape(n // R, R).min(-1)), -1, H - 1)
    idx = ((y0 + 1) * (W + 1) + (x0 + 1)).astype(jnp.int32)
    u = x - jnp.repeat(x0, R)
    v = y - jnp.repeat(y0, R)
    return idx, u, v


def hat_weights(u, p):
    """[p, N] hat (bilinear) weights over patch texel positions.

    w[t] = max(0, 1 - |u - t|): reproduces the two bilinear corner
    weights for in-patch u, and vanishes for out-of-patch u (the
    zero-padding behavior for coverage violations / far-out coords).
    """
    t = jnp.arange(p, dtype=u.dtype)[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[None, :] - t))


def patch_blend(rows, u, v, px, py, C):
    """Blend gathered patch rows [N//R, px*py*C] to features [C, N].

    Pure-XLA reference for the in-kernel blend (parity tests + the
    non-Pallas fallback). rows bf16/f32; u, v per-sample offsets.
    """
    n = u.shape[0]
    R = n // rows.shape[0]
    wx = hat_weights(u, px)                    # [px, N]
    wy = hat_weights(v, py)                    # [py, N]
    feats = rows.reshape(n // R, py, px, C).astype(jnp.float32)
    feats = jnp.repeat(feats, R, axis=0)       # [N, py, px, C]
    w = (wy.T[:, :, None] * wx.T[:, None, :])  # [N, py, px]
    out = jnp.einsum("nyx,nyxc->cn", w, feats)
    return out


def grid_sample_2d_cf_patch(grid_hwc, coords, R=4, px=4, py=2):
    """Coherent-block bilinear sampling, output [C, N] channels-first.

    coords: [N, 2] normalized (align_corners=True), rays grouped in
    R-consecutive coherent blocks. Exact vs grid_sample_2d_cf_quad when
    each block's footprint fits (px, py); zero-feature degradation
    otherwise.
    """
    H, W, C = grid_hwc.shape
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    table = build_patch_table_2d(grid_hwc, px, py)
    idx, u, v = patch_anchors_2d(x, y, R, W, H, px, py)
    rows = table[idx]                          # [N // R, px*py*C] gather
    return patch_blend(rows, u, v, px, py, C)


def coverage_violations(x, y, R, px=4, py=2):
    """Fraction of samples whose 2x2 footprint exits the block patch
    (the samples patch sampling zero-degrades). For render-path logging
    and tests; x, y unnormalized texel coords grouped like
    patch_anchors_2d."""
    n = x.shape[0]
    xb = x.reshape(n // R, R)
    yb = y.reshape(n // R, R)
    vx = jnp.floor(xb.max(-1)) - jnp.floor(xb.min(-1)) > px - 2
    vy = jnp.floor(yb.max(-1)) - jnp.floor(yb.min(-1)) > py - 2
    return (vx | vy).mean()
