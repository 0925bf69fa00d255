"""Multi-axis families x fast stack (VERDICT r3 item 2, real TPU):

For llff-class static ([8,4,4], 3 quad gathers/sample) and
neural_3d-class dynamic (z=64, 3 space + 3 time factors): measure the
fused path vs fused+patch (3 patch gathers replace 3 quad gathers:
the biggest gather floor in the repo) and fused+patch+tile128 (the
pack-build kernel engages at tile 128). Parity vs the general path on
coherent scanline rays gates every variant.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "experiments")
from exp_multiaxis_tile import rays_chunk  # noqa: E402


def log(*a):
    print(*a, flush=True)


def build(family, mode, info, force_tile=None, grid=128):
    from hyperreel_tpu.configs.presets import (
        llff_z_plane, neural_3d_z_plane, convert_epochs_to_iters,
        with_coherent_gather)
    from hyperreel_tpu.models.model import build_model
    preset = {"llff": llff_z_plane, "n3d": neural_3d_z_plane}[family]
    cfg = convert_epochs_to_iters(preset(), 4000)
    net = cfg["color"]["net"]
    net["fused_render"] = mode != "general"
    if mode == "general":
        net["fused_render_cf"] = False
    net["N_voxel_init"] = grid ** 3
    net["N_voxel_final"] = grid ** 3
    net["upsamp_list"] = []
    net["update_AlphaMask_list"] = []
    if "patch" in mode:
        cfg = with_coherent_gather(cfg)
    if force_tile:
        os.environ["HYPERREEL_EVAL_TILE"] = str(force_tile)
    else:
        os.environ.pop("HYPERREEL_EVAL_TILE", None)
    return build_model(cfg, dataset_info=info, compute_dtype=jnp.bfloat16)


def scanline_rays(n, width):
    # megapixel-density scanlines (coherent 4-ray blocks) — the patch
    # coverage regime; reuse exp_multiaxis_tile's frame geometry
    return jnp.asarray(np.asarray(rays_chunk(n, width)))


def f_of(m, pm=False):
    from hyperreel_tpu.models.ctx import StepCtx
    rk = {"rays_phase_major": True} if pm else None

    @jax.jit
    def f(params, rays, it):
        return m.apply(params, rays,
                       StepCtx(it=it, rng=jax.random.PRNGKey(1),
                               training=False), rk)["rgb"]
    return f


def timeit(f, params, rays, n_t=5):
    out = f(params, rays, jnp.int32(4000))
    float(out[0, 0])
    variants = [rays.at[0, 0].add(1e-6 * (i + 1)) for i in range(n_t)]
    for v in variants:
        float(v[0, 0])
    t0 = time.perf_counter()
    outs = [f(params, v, jnp.int32(4000)) for v in variants]
    float(outs[-1][0, 0])
    return (time.perf_counter() - t0) / n_t


def run(family, info, width):
    n = 1 << 18
    rays = scanline_rays(n, width)
    perm = np.arange(n).reshape(n // 4, 4).T.reshape(n)
    rays_pm = jnp.asarray(np.asarray(rays)[perm])

    m_gen = build(family, "general", info)
    params = m_gen.init(jax.random.PRNGKey(0))
    f_gen = f_of(m_gen)
    small = rays[:8192]
    ref_small = np.asarray(f_gen(params, small, jnp.int32(4000)))
    dt_gen = timeit(f_gen, params, rays)
    log(f"[{family}] general: {dt_gen*1e3:7.2f} ms "
        f"({n/dt_gen/1e6:5.2f} Mrays/s)")

    for tag, mode, force in (("fused", "fused", None),
                             ("fused+patch", "patch", None),
                             ("fused+patch+tile128", "patch", 128)):
        try:
            m = build(family, mode, info, force_tile=force)
            pm = "patch" in mode
            f = f_of(m, pm=pm)
            sm = jnp.asarray(np.asarray(small)[
                np.arange(8192).reshape(2048, 4).T.reshape(8192)]) \
                if pm else small
            got_raw = np.asarray(f(params, sm, jnp.int32(4000)))
            if pm:
                got = np.empty_like(got_raw)
                got[np.arange(8192).reshape(2048, 4).T.reshape(8192)] = \
                    got_raw
            else:
                got = got_raw
            err = np.abs(got - ref_small).max()
            dt = timeit(f, params, rays_pm if pm else rays)
            log(f"[{family}] {tag}: {dt*1e3:7.2f} ms "
                f"({n/dt/1e6:5.2f} Mrays/s) parity {err:.2e}")
        except Exception as e:
            log(f"[{family}] {tag}: FAILS -> {type(e).__name__}: "
                f"{str(e)[:300]}")
    os.environ.pop("HYPERREEL_EVAL_TILE", None)


def main():
    log("devices:", jax.devices())
    run("llff", {"num_views": 8}, 6)
    run("n3d", {"num_keyframes": 4, "num_frames": 50, "num_views": 16}, 8)


if __name__ == "__main__":
    sys.exit(main())
