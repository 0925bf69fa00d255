"""/verify drive (round 5): compose every round-5-changed piece on the
REAL TPU through the package boundary.

1. fast scatter (_scatter_add_cf_cols) through jax.grad of the quad
   sampler at train scale: finite grads, matches the XLA-scatter path.
2. multi-axis fused-patch eval (axis-outer kernel + tile_fp): compiles
   on HW, finite rgb, parity vs the two-kernel route.
3. flagship patch eval with the coverage witness: viol == 0 on
   scanline rays, > 0 on scattered rays; rgb finite both ways.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def scanline_rays(n=4096, side=4096, extra=None):
    fov_px = side * 1.2
    seg = n // 2
    rows = []
    for r in (-40.0, 32.0):
        u = (np.arange(seg, dtype=np.float32) - seg / 2) / fov_px
        v = np.full(seg, r / fov_px, np.float32)
        rows.append(np.stack([u, v, np.ones_like(u)], -1))
    d = np.concatenate(rows, 0)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    cols = [o, d]
    if extra:
        cols += [np.full((n, 1), x, np.float32) for x in extra]
    return jnp.asarray(np.concatenate(cols, -1))


def main():
    log("devices:", jax.devices())

    # ---- 1. fast scatter under grad, train scale -------------------
    import os
    from hyperreel_tpu.ops import grid_sample as GS
    rng = np.random.default_rng(0)
    H = W = 801
    C = 16
    N = 524288
    grid = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-1.02, 1.02, (N, 2)).astype(np.float32))
    cot = jnp.asarray(
        rng.standard_normal((C // 2, N, 2)).astype(np.float32))

    def loss(g, c):
        return jnp.sum(GS.grid_sample_2d_cf_quad(g, c) * cot)

    os.environ["HYPERREEL_FAST_SCATTER"] = "1"
    gg, gc = jax.jit(jax.grad(loss, argnums=(0, 1)))(grid, coords)
    gg, gc = np.asarray(gg), np.asarray(gc)
    assert np.isfinite(gg).all() and np.isfinite(gc).all()
    # subsample agreement vs the XLA scatter path
    os.environ["HYPERREEL_FAST_SCATTER"] = "0"
    gg0, gc0 = jax.jit(jax.grad(loss, argnums=(0, 1)))(grid, coords)
    dg = float(np.abs(gg - np.asarray(gg0)).max())
    dc = float(np.abs(gc - np.asarray(gc0)).max())
    log(f"fast-scatter grad: |dgrid| {dg:.2e} |dcoords| {dc:.2e}")
    assert dg < 1e-3 and dc < 1e-3, (dg, dc)
    os.environ["HYPERREEL_FAST_SCATTER"] = "1"

    # ---- 2. multi-axis fused-patch (llff-class), small batch -------
    from hyperreel_tpu.configs.presets import (
        llff_z_plane, convert_epochs_to_iters, with_coherent_gather)
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import make_ctx
    cfg = convert_epochs_to_iters(llff_z_plane(), 4000)
    net = cfg["color"]["net"]
    net["fused_render"] = True
    net["N_voxel_init"] = net["N_voxel_final"] = 128 ** 3
    net["upsamp_list"] = []
    net["update_AlphaMask_list"] = []
    cfg = with_coherent_gather(cfg)
    info = {"num_frames": 1, "num_keyframes": 1, "num_views": 16}
    m = build_model(cfg, dataset_info=info, compute_dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0))
    rays = scanline_rays(4096)[:, :6]
    ctx = make_ctx(it=0, training=False)
    os.environ.pop("HYPERREEL_FUSED_PATCH_MULTI", None)
    out = m.apply(params, rays, ctx)
    a = np.asarray(out["rgb"])
    viol = float(out["patch_coverage_viol"])
    assert np.isfinite(a).all()
    log(f"multi-axis fused-patch: rgb finite, viol {viol:.2e}")
    os.environ["HYPERREEL_FUSED_PATCH_MULTI"] = "0"
    b = np.asarray(m.apply(params, rays, ctx)["rgb"])
    os.environ.pop("HYPERREEL_FUSED_PATCH_MULTI", None)
    err = float(np.abs(a - b).max())
    log(f"fused vs two-kernel parity: {err:.2e}")
    assert err < 2e-4, err

    # ---- 3. flagship witnesses + uniform-time premix on HW ----------
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as GE
    fn, (p, _r, it, rg) = GE.entry(coherent_gather=True, prepared=True,
                                   patch_shape=(3, 2), coverage_out=True)
    jf = jax.jit(fn)
    n = 4096
    sr = scanline_rays(n, extra=(3.0, 0.3))
    pm = np.asarray(sr).reshape(n // 4, 4, -1).transpose(1, 0, 2).reshape(
        n, -1)
    rgb, viol, _ut = jf(p, jnp.asarray(pm), it, rg)
    rgb, viol = np.asarray(rgb), float(viol)
    assert np.isfinite(rgb).all()
    log(f"flagship scanline patch viol: {viol:.2e} (expect 0)")
    assert viol == 0.0, viol
    scat = np.asarray(sr).copy()
    rng2 = np.random.default_rng(7)
    scat[:, 3:5] = rng2.uniform(-0.4, 0.4, (n, 2)).astype(np.float32)
    rgb2, viol2, _ = jf(p, jnp.asarray(scat), it, rg)
    viol2 = float(viol2)
    log(f"flagship scattered patch viol: {viol2:.2e} (expect > 0)")
    assert viol2 > 0.0
    assert np.isfinite(np.asarray(rgb2)).all()

    # uniform-time premix: parity vs the per-sample mix + witness
    fn_u, (pu, _r2, it, rg) = GE.entry(
        coherent_gather=True, prepared=True, patch_shape=(3, 2),
        coverage_out=True, uniform_time=True)
    rgb_u, _pv, utv = jax.jit(fn_u)(pu, jnp.asarray(pm), it, rg)
    utv = float(utv)
    err_u = float(np.abs(np.asarray(rgb_u) - rgb).max())
    log(f"uniform-time premix: witness {utv:.2e} (expect 0), "
        f"|premix - per-sample| {err_u:.2e}")
    assert utv == 0.0, utv
    assert err_u < 2e-4, err_u
    # varied-t chunk must trip the witness
    vt = pm.copy()
    vt[:, 7] = np.linspace(0.1, 0.9, n).astype(np.float32)
    _rgb_v, _pv2, utv2 = jax.jit(fn_u)(pu, jnp.asarray(vt), it, rg)
    utv2 = float(utv2)
    log(f"varied-t witness: {utv2:.2e} (expect > 0)")
    assert utv2 > 0.0

    # ---- 4. R=8 coherent blocks (round-5): (5,2) patch, one row per
    # 8 consecutive rays. Parity vs the R=4 route + witness 0 on the
    # scanline chunk; both fused (tile-shrunk) and two-kernel (keeps
    # tile 128) variants.
    fn8, (p8, _r3, it, rg) = GE.entry(
        coherent_gather=True, prepared=True, patch_shape=(5, 2),
        coverage_out=True, uniform_time=True, patch_block=8)
    pm8 = np.asarray(sr).reshape(n // 8, 8, -1).transpose(
        1, 0, 2).reshape(n, -1)
    rgb8_pm, v8, _ = jax.jit(fn8)(p8, jnp.asarray(pm8), it, rg)
    v8 = float(v8)
    un8 = np.empty_like(np.asarray(rgb8_pm))
    perm8 = np.arange(n).reshape(n // 8, 8).T.reshape(n)
    un8[perm8] = np.asarray(rgb8_pm)
    un_u = np.empty_like(np.asarray(rgb_u))
    perm4 = np.arange(n).reshape(n // 4, 4).T.reshape(n)
    un_u[perm4] = np.asarray(rgb_u)
    err8 = float(np.abs(un8 - un_u).max())
    log(f"R=8 fused: witness {v8:.2e} (expect 0), |R8 - R4| {err8:.2e}")
    assert v8 == 0.0 and err8 < 2e-4, (v8, err8)
    os.environ["HYPERREEL_FUSED_PATCH"] = "0"
    fn8b, (p8b, _r4_, it, rg) = GE.entry(
        coherent_gather=True, prepared=True, patch_shape=(5, 2),
        coverage_out=True, uniform_time=True, patch_block=8)
    rgb8b, v8b, _ = jax.jit(fn8b)(p8b, jnp.asarray(pm8), it, rg)
    os.environ.pop("HYPERREEL_FUSED_PATCH", None)
    err8b = float(np.abs(np.asarray(rgb8b) - np.asarray(rgb8_pm)).max())
    log(f"R=8 two-kernel: witness {float(v8b):.2e}, "
        f"|2k - fused| {err8b:.2e}")
    assert err8b < 2e-4, err8b

    log("ALL OK")


if __name__ == "__main__":
    main()
