"""Patch-gather coverage analysis (CPU, geometry-level).

The coherent-gather design gathers ONE (px x py)-texel patch row per
R-consecutive-ray block per sorted sample slot, replacing R row-gathers
(PERFORMANCE.md: the only open route under the ~557M rows/s per-row
floor is a coherence-exploiting table redesign). It is exact iff every
block's bilinear footprint at each slot fits the patch:
    max_texel - min_texel <= patch_side - 2   (per axis)

This script measures the ACTUAL per-(block, slot) texel spreads on the
flagship dynamic model for bench-style scanline rays and a tilted
orbit-style camera, at grid resolutions 128/256/512, for R in {4, 8,
16} — the violation rate (clamp-error rate) the approximate mode would
pay, BEFORE any kernel work.

Caveat: init-weight z predictions (no trained blob ckpt on CPU); spreads
are geometry-dominated (t * pixel-direction-delta * res/aabb), so init
stats bound the shape of the answer. Run on a trained ckpt before
shipping defaults.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, flush=True)


def scanline_rays(n_rows=8, row_len=256, side=1024, rot_deg=0.0):
    """Consecutive-pixel scanline segments from a side^2 pinhole frame,
    optionally with the camera rotated about x by rot_deg (orbit-style
    tilt — scanline rays then spread in BOTH texel axes)."""
    fov_px = side * 1.2
    rows = np.linspace(64, side - 64, n_rows).astype(int)
    x0 = (side - row_len) // 2
    us, vs = [], []
    for r in rows:
        us.append((np.arange(x0, x0 + row_len) - (side - 1) / 2) / fov_px)
        vs.append(np.full(row_len, (r - (side - 1) / 2) / fov_px))
    u = np.concatenate(us)
    v = np.concatenate(vs)
    d = np.stack([u, v, np.ones_like(u)], -1)
    if rot_deg:
        th = np.deg2rad(rot_deg)
        R = np.array([[1, 0, 0],
                      [0, np.cos(th), -np.sin(th)],
                      [0, np.sin(th), np.cos(th)]], np.float32)
        d = d @ R.T
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    if rot_deg:
        o = o @ R.T
    n = len(d)
    cam = np.full((n, 1), 3.0, np.float32)
    t = np.full((n, 1), 0.3, np.float32)
    return np.concatenate([o, d, cam, t], -1).astype(np.float32)


def main():
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx

    cfg = convert_epochs_to_iters(technicolor_z_plane(), 4000)
    info = {"num_keyframes": 4, "num_frames": 50, "num_views": 16}
    model = build_model(cfg, dataset_info=info)
    params = model.init(jax.random.PRNGKey(0))
    aabb = np.asarray(
        cfg["embedding"]["embeddings"]["ray_intersect_0"]["intersect"]
        .get("aabb", [[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]]), np.float32)

    for label, rot in (("scanline", 0.0), ("orbit-tilt-25deg", 25.0)):
        rays = jnp.asarray(scanline_rays(rot_deg=rot))
        ctx = StepCtx(it=jnp.int32(100000), rng=jax.random.PRNGKey(1),
                      training=False)
        x = model.embed(params, rays, ctx)
        pts = np.asarray(x["points"])            # [B, S, 3]
        B, S, _ = pts.shape
        # normalized [-1, 1] -> texel coords per grid resolution
        norm = (pts - aabb[0]) / (aabb[1] - aabb[0]) * 2 - 1
        log(f"--- {label}: B={B}, S={S}, "
            f"coord range {norm.min():.2f}..{norm.max():.2f}")
        for res in (128, 256, 512):
            tex = (norm + 1) / 2 * (res - 1)     # [B, S, 3]
            for R in (4, 8, 16):
                nb = B // R
                t = tex[: nb * R].reshape(nb, R, S, 3)
                spread = t.max(1) - t.min(1)     # [nb, S, 3]
                sp = spread.reshape(-1, 3)
                q = np.percentile(sp, [50, 95, 99.9], axis=0)
                # violation rates for 4x4 (budget 2) and 8x8 (budget 6)
                v4 = (sp > 2.0).any(-1).mean()
                v8 = (sp > 6.0).any(-1).mean()
                log(f"res={res:3d} R={R:2d}: spread p50 "
                    f"{q[0].round(2)} p95 {q[1].round(2)} "
                    f"p99.9 {q[2].round(2)} | viol 4x4 {v4:.4%} "
                    f"8x8 {v8:.4%}")


if __name__ == "__main__":
    sys.exit(main())
