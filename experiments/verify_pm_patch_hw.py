"""Verify drive (real TPU): phase-major rays contract + patch-size probe.

1. rays_phase_major parity: pre-permuted rays + host un-permute must
   match (a) the in-graph-permute patch path exactly and (b) the
   general path at 2e-4, on scanline megapixel-density rays, it=0 and
   5000, with degenerate d_z rows finite.
2. chunk timing: pm contract vs in-graph permutes (expects ~0.9 ms/chunk
   back: the two [B//4,4,*] transpose while-loops drop out).
3. patch-size probe: px,py=(3,2) (192 B rows vs the default 4x3=384 B)
   parity + violation rate + chunk time — the gather is per-row-rate
   bound, so narrower rows only help if coverage holds.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def build(mode, px=4, py=3):
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters, with_coherent_gather)
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx

    cfg = convert_epochs_to_iters(technicolor_z_plane(), 4000)
    cfg["color"]["net"]["fused_render"] = True
    if mode == "patch":
        cfg = with_coherent_gather(cfg, px, py)
    elif mode == "general":
        cfg["color"]["net"]["fused_render"] = False
        cfg["color"]["net"]["fused_render_cf"] = False
    info = {"num_keyframes": 4, "num_frames": 50, "num_views": 16}
    model = build_model(cfg, dataset_info=info, compute_dtype=jnp.bfloat16)

    def fn(params, rays, it, rng, rk=None):
        ctx = StepCtx(it=it, rng=rng, training=False)
        return model.apply(params, rays, ctx, rk)["rgb"]

    return model, fn


def scanline_rays(n, degenerate=False):
    side = 1 << 10
    fov_px = side * 1.2
    rows = n // side
    u = (np.arange(side, dtype=np.float32) - side / 2) / fov_px
    v = (np.arange(rows, dtype=np.float32) - rows / 2) / fov_px
    uu, vv = np.meshgrid(u, v)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    if degenerate:
        d[:8, 2] = 0.0  # d_z = 0 rows: _safe_dirs path
    cam = np.full((n, 1), 3.0, np.float32)
    t = np.full((n, 1), 0.3, np.float32)
    return np.concatenate([o, d, cam, t], -1).astype(np.float32)


def timeit(jf, params, rays, it, rng, n_t=6, rk_used=False):
    out = jf(params, rays, it, rng)
    float(out[0, 0])
    variants = [rays.at[0, 0].add(1e-6 * (i + 1)) for i in range(n_t)]
    for v in variants:
        float(v[0, 0])
    t0 = time.perf_counter()
    outs = [jf(params, v, it, rng) for v in variants]
    float(outs[-1][0, 0])
    return (time.perf_counter() - t0) / n_t


def main():
    log("devices:", jax.devices())
    n = 1 << 18
    rays_np = scanline_rays(n, degenerate=True)
    perm = np.arange(n).reshape(n // 4, 4).T.reshape(n)
    rays = jnp.asarray(rays_np)
    rays_pm = jnp.asarray(rays_np[perm])
    rng = jax.random.PRNGKey(1)

    m_g, fn_g = build("general")
    params = m_g.init(jax.random.PRNGKey(0))
    jf_g = jax.jit(lambda p, r, i, k: fn_g(p, r, i, k))

    m_p, fn_p = build("patch")
    jf_p = jax.jit(lambda p, r, i, k: fn_p(p, r, i, k))
    jf_pm = jax.jit(
        lambda p, r, i, k: fn_p(p, r, i, k, {"rays_phase_major": True}))

    for itv in (0, 5000):
        it = jnp.asarray(itv, jnp.int32)
        ref = np.asarray(jf_g(params, rays, it, rng))
        got_in = np.asarray(jf_p(params, rays, it, rng))
        got_pm_raw = np.asarray(jf_pm(params, rays_pm, it, rng))
        got_pm = np.empty_like(got_pm_raw)
        got_pm[perm] = got_pm_raw
        assert np.isfinite(got_pm).all(), "pm outputs not finite"
        e_in = np.abs(got_in - ref).max()
        e_pm = np.abs(got_pm - ref).max()
        e_xx = np.abs(got_pm - got_in).max()
        log(f"it={itv}: |patch-gen| {e_in:.2e}  |pm-gen| {e_pm:.2e}  "
            f"|pm-patch| {e_xx:.2e}")
        assert e_pm < 2e-4 and e_xx < 1e-5, (e_pm, e_xx)

    it = jnp.asarray(0, jnp.int32)
    dt_in = timeit(jf_p, params, rays, it, rng)
    dt_pm = timeit(jf_pm, params, rays_pm, it, rng)
    log(f"chunk: in-graph {dt_in*1e3:6.2f} ms ({n/dt_in/1e6:5.2f} Mr/s)  "
        f"pm {dt_pm*1e3:6.2f} ms ({n/dt_pm/1e6:5.2f} Mr/s)")

    # patch-size probe ladder: (3,2) is the shipped default (192 B
    # rows); (2,2)/(3,3) bound how much further row narrowing buys and
    # where exactness breaks at bench pixel density
    ref = np.asarray(jf_g(params, rays, it, rng))
    for px, py in ((3, 2), (2, 2), (3, 3)):
        m_s, fn_s = build("patch", px=px, py=py)
        jf_s = jax.jit(lambda p, r, i, k, f=fn_s: f(
            p, r, i, k, {"rays_phase_major": True}))
        got_raw = np.asarray(jf_s(params, rays_pm, it, rng))
        got = np.empty_like(got_raw)
        got[perm] = got_raw
        e = np.abs(got - ref).max()
        dt_s = timeit(jf_s, params, rays_pm, it, rng)
        log(f"px,py=({px},{py}): |err| {e:.2e}  chunk {dt_s*1e3:6.2f} ms "
            f"({n/dt_s/1e6:5.2f} Mr/s)")
    log("ALL OK")


if __name__ == "__main__":
    main()
