"""HW verify: in-kernel scene contraction (pack_build contract_rows).

Builds the llff-family static multi-axis model (mipnerf contraction,
[8,4,4] grids) with the pack-build kernel active, vs the general path,
on the real TPU. Checks Mosaic lowering + parity + finiteness.
"""

import copy
import os
import sys

# force tile=128: pick_tile's conservative 8 MB VMEM cap selects 64 for
# 3-axis models at 96^3, which gates off the pack kernel (tile==128)
os.environ["HYPERREEL_EVAL_TILE"] = "128"

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    from hyperreel_tpu.configs.presets import (
        llff_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx
    import hyperreel_tpu.ops.pallas.pack_build as PB

    calls = []
    orig = PB.pack_build

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)
    PB.pack_build = spy

    log("devices:", jax.devices())
    cfg = convert_epochs_to_iters(llff_z_plane(), 4000)
    net = cfg["color"]["net"]
    net["fused_render"] = True
    net["N_voxel_init"] = 96 ** 3
    net["N_voxel_final"] = 96 ** 3
    net["upsamp_list"] = []
    net["update_AlphaMask_list"] = []
    info = {"num_views": 8}

    m_cf = build_model(cfg, dataset_info=info, compute_dtype=jnp.bfloat16)
    assert m_cf._cf_eval is not None, "CF eval path not selected"
    assert m_cf._cf_eval._pack_ok, "pack kernel not eligible!"
    ct = m_cf._cf_eval.isect.contract
    log("contract:", ct.name, "contract_samples:", ct.contract_samples)
    assert ct.name != "identity"

    cfg2 = copy.deepcopy(cfg)
    cfg2["color"]["net"]["fused_render"] = False
    cfg2["color"]["net"]["fused_render_cf"] = False
    m_g = build_model(cfg2, dataset_info=info, compute_dtype=jnp.bfloat16)

    params = m_cf.init(jax.random.PRNGKey(0))

    n = 4096
    side = 64
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / (side * 1.2)
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    rays = np.concatenate([o, d], -1).astype(np.float32)
    rays[-8:, 5] = 0.0       # degenerate d_z
    rays = jnp.asarray(rays)

    @jax.jit
    def f(m, params, rays, it):
        return m.apply(params, rays,
                       StepCtx(it=it, rng=jax.random.PRNGKey(1),
                               training=False))["rgb"]

    f_cf = jax.jit(lambda p, r, i: m_cf.apply(
        p, r, StepCtx(it=i, rng=jax.random.PRNGKey(1),
                      training=False))["rgb"])
    f_g = jax.jit(lambda p, r, i: m_g.apply(
        p, r, StepCtx(it=i, rng=jax.random.PRNGKey(1),
                      training=False))["rgb"])

    a = np.asarray(f_cf(params, rays, jnp.int32(5000)))
    b = np.asarray(f_g(params, rays, jnp.int32(5000)))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    err = np.abs(a - b).max()
    log(f"max |kernel - general| = {err:.3e}")
    assert err < 2e-4, err
    assert calls, "pack_build kernel never invoked!"
    log("contract-in-kernel HW PARITY OK")


if __name__ == "__main__":
    sys.exit(main())
