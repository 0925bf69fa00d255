"""Validate the fused Pallas render core on the real TPU: compile,
numerical parity vs the XLA path, and chained-call timing at the bench
chunk shape (262144 rays)."""

import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def build(fused):
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx

    cfg = convert_epochs_to_iters(technicolor_z_plane(), 4000)
    cfg["color"]["net"]["fused_render"] = fused
    info = {"num_keyframes": 4, "num_frames": 50, "num_views": 16}
    model = build_model(cfg, dataset_info=info,
                        compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))

    def fn(params, rays, it, rng):
        ctx = StepCtx(it=it, rng=rng, training=False)
        return model.apply(params, rays, ctx)["rgb"]

    return fn, params


def rays_chunk(n, seed=0):
    rng = np.random.default_rng(seed)
    side = int(np.sqrt(n))
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    cam = np.full((n, 1), 3.0, np.float32)
    t = np.full((n, 1), 0.3, np.float32)
    return jnp.asarray(np.concatenate([o, d, cam, t], -1))


def time_fn(jfn, params, rays, it, rng, k1=3, k2=9):
    """Chained timing that survives the axon tunnel: every call's input
    depends on the FULL previous output (sum is never exactly zero) and
    perturbs a distinct element, so no two queued calls are identical —
    corner-pixel outputs are often exactly 0.0, which silently collapsed
    an out[0,0]-based chain into deduped repeats."""
    def run(k):
        t0 = time.perf_counter()
        carry = None
        out = None
        for i in range(k):
            delta = 1e-6 * (i + 1) if carry is None \
                else carry * 1e-9 + 1e-6 * (i + 1)
            r = rays.at[0, i % 6].add(delta)
            out = jfn(params, r, it, rng)
            carry = jnp.sum(out)
        float(carry)
        return time.perf_counter() - t0
    run(1)  # warm
    t1 = run(k1)
    t2 = run(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    log("devices:", jax.devices())
    it = jnp.asarray(0, jnp.int32)
    rng = jax.random.PRNGKey(1)

    n = 1 << 18
    rays = rays_chunk(n)

    fn_r, params = build(False)
    fn_f, _ = build(True)
    jr = jax.jit(fn_r)
    jf = jax.jit(fn_f)

    small = rays[:4096]
    log("compiling reference path (small)...")
    out_r = np.asarray(jr(params, small, it, rng))
    log("compiling fused path (small)...")
    out_f = np.asarray(jf(params, small, it, rng))
    err = np.abs(out_r - out_f).max()
    log(f"parity @4096 rays: max abs err = {err:.5f} "
        f"(finite={np.isfinite(out_f).all()})")

    log("compiling + timing full chunk (262144 rays)...")
    dt_r = time_fn(jr, params, rays, it, rng)
    log(f"reference path: {dt_r*1e3:.1f} ms/chunk "
        f"-> {n/dt_r/1e6:.2f} Mrays/s")
    dt_f = time_fn(jf, params, rays, it, rng)
    log(f"fused path:     {dt_f*1e3:.1f} ms/chunk "
        f"-> {n/dt_f/1e6:.2f} Mrays/s")
    log("DONE")


if __name__ == "__main__":
    main()
