"""Probe: force tile=128 (-> pack-build kernel engages) for the
multi-axis families at REAL grid scale, vs the heuristic tile=64
legacy-tail path. Checks Mosaic compiles at the bigger block, parity vs
the general path, and times a 262144-ray chunk each way.

The pick_tile VMEM heuristic (8 MB scratch cap) predates the pack/shade
kernels and forces tile=64 for 3-axis models at 96^3+, which disables
the pack-build kernel (tile==128 gate). This measures whether the cap
can be lifted.

  HYPERREEL_EVAL_TILE=128 selects the forced path (set inside).
"""

import copy
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def build(family, fused, info, force_tile=None, grid=128):
    from hyperreel_tpu.configs.presets import (
        llff_z_plane, neural_3d_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.models.model import build_model
    preset = {"llff": llff_z_plane, "n3d": neural_3d_z_plane}[family]
    cfg = convert_epochs_to_iters(preset(), 4000)
    net = cfg["color"]["net"]
    net["fused_render"] = bool(fused)
    if not fused:
        net["fused_render_cf"] = False
    net["N_voxel_init"] = grid ** 3
    net["N_voxel_final"] = grid ** 3
    net["upsamp_list"] = []
    net["update_AlphaMask_list"] = []
    if force_tile:
        os.environ["HYPERREEL_EVAL_TILE"] = str(force_tile)
    else:
        os.environ.pop("HYPERREEL_EVAL_TILE", None)
    return build_model(cfg, dataset_info=info,
                       compute_dtype=jnp.bfloat16)


def rays_chunk(n, width):
    side = int(np.sqrt(n))
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    cols = [o, d]
    if width >= 7:
        cols.append(np.full((n, 1), 3.0, np.float32))
    if width >= 8:
        cols.append(np.full((n, 1), 0.3, np.float32))
    return np.concatenate(cols, -1).astype(np.float32)


def run_scale(family, info, width, grids=(256, 640)):
    """Fused-only tile128 probe at bigger grids (no general-path
    compile; correctness pinned by run() at 128^3 + CPU tests)."""
    from hyperreel_tpu.models.ctx import StepCtx
    import hyperreel_tpu.ops.pallas.pack_build as PB

    n = 1 << 18
    rays = jnp.asarray(rays_chunk(n, width))

    calls = []
    orig = PB.pack_build

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)
    PB.pack_build = spy

    for grid in grids:
        for tag, force in (("heuristic", None), ("tile128", 128)):
            calls.clear()
            m = build(family, True, info, force_tile=force, grid=grid)
            params = m.init(jax.random.PRNGKey(0))

            @jax.jit
            def f(params, rays, it):
                return m.apply(params, rays,
                               StepCtx(it=it, rng=jax.random.PRNGKey(1),
                                       training=False))["rgb"]
            try:
                out = f(params, rays, jnp.int32(4000))
                float(out[0, 0])
                variants = [rays.at[0, 0].add(1e-6 * (i + 1))
                            for i in range(4)]
                for v in variants:
                    float(v[0, 0])
                t0 = time.perf_counter()
                outs = [f(params, v, jnp.int32(4000)) for v in variants]
                float(outs[-1][0, 0])
                dt = (time.perf_counter() - t0) / 4
                log(f"[{family}@{grid}] {tag}: chunk {dt*1e3:7.2f} ms "
                    f"({n/dt/1e6:5.2f} Mrays/s) "
                    f"kernel={'Y' if calls else 'n'}")
            except Exception as e:
                log(f"[{family}@{grid}] {tag}: FAILS -> "
                    f"{type(e).__name__}: {str(e)[:200]}")
    os.environ.pop("HYPERREEL_EVAL_TILE", None)


def run(family, info, width):
    from hyperreel_tpu.models.ctx import StepCtx
    import hyperreel_tpu.ops.pallas.pack_build as PB

    n = 1 << 18
    rays_np = rays_chunk(n, width)
    rays = jnp.asarray(rays_np)
    small = jnp.asarray(rays_np[:4096])

    def f_of(m):
        @jax.jit
        def f(params, rays, it):
            return m.apply(params, rays,
                           StepCtx(it=it, rng=jax.random.PRNGKey(1),
                                   training=False))["rgb"]
        return f

    def timeit(f, params, n_t=6):
        out = f(params, rays, jnp.int32(4000))
        float(out[0, 0])
        variants = [rays.at[0, 0].add(1e-6 * (i + 1))
                    for i in range(n_t)]
        for v in variants:
            float(v[0, 0])
        t0 = time.perf_counter()
        outs = [f(params, v, jnp.int32(4000)) for v in variants]
        float(outs[-1][0, 0])
        return (time.perf_counter() - t0) / n_t

    calls = []
    orig = PB.pack_build

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)
    PB.pack_build = spy

    m_gen = build(family, False, info)
    params = m_gen.init(jax.random.PRNGKey(0))
    f_gen = f_of(m_gen)
    ref_small = np.asarray(f_gen(params, small, jnp.int32(4000)))

    for tag, force in (("heuristic", None), ("tile128", 128)):
        calls.clear()
        m = build(family, True, info, force_tile=force)
        f = f_of(m)
        try:
            got = np.asarray(f(params, small, jnp.int32(4000)))
            err = np.abs(got - ref_small).max()
            dt = timeit(f, params)
            log(f"[{family}] {tag}: chunk {dt*1e3:7.2f} ms "
                f"({n/dt/1e6:5.2f} Mrays/s) parity {err:.2e} "
                f"kernel={'Y' if calls else 'n'}")
        except Exception as e:
            log(f"[{family}] {tag}: FAILS -> {type(e).__name__}: "
                f"{str(e)[:300]}")
    os.environ.pop("HYPERREEL_EVAL_TILE", None)


def main():
    log("devices:", jax.devices())
    if len(sys.argv) > 1 and sys.argv[1] == "scale":
        run_scale("llff", {"num_views": 8}, 6)
        return
    run("llff", {"num_views": 8}, 6)
    run("n3d", {"num_keyframes": 4, "num_frames": 50, "num_views": 16}, 8)


if __name__ == "__main__":
    sys.exit(main())
