"""Verify drive (real TPU): round-4 intersect bound-semantics changes.

1. base Intersect near defaults to the DATASET near under
   use_dataset_bounds (reference nlf/intersect/base.py:87-91) — drive
   donerf_cylinder and check the validity mask actually changes vs an
   explicit near=0 override.
2. euclidean_distance_unified pluecker base-distance offset
   (reference primitive.py:126-179) — drive catacaustics_distance,
   incl. degenerate rays through the origin (cross products vanish).
3. voxel_grid dataset-bbox initial/end defaults (reference
   voxel.py:25-29) — drive donerf_voxel, check anchors moved off the
   [0,1] default and fwd+grad stay finite.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.configs import reference_yaml
from hyperreel_tpu.configs.presets import convert_epochs_to_iters
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.models.ctx import make_ctx


def log(*a):
    print(*a, flush=True)


INFO = {"num_keyframes": 4, "num_frames": 8, "num_views": 4,
        "near": 0.5, "far": 6.0, "depth_range": (1.0, 8.0),
        "bbox": (np.array([-1.5, -1.25, -1.75], np.float32),
                 np.array([1.25, 1.75, 1.5], np.float32))}


def shrink(cfg, grid=24):
    net = cfg["color"]["net"]
    net["N_voxel_init"] = grid ** 3
    net["N_voxel_final"] = grid ** 3
    if "grid_size" in net:
        net["grid_size"] = {"start": [grid] * 3, "end": [grid] * 3}
    net["upsamp_list"] = []
    net["update_AlphaMask_list"] = []
    for st in cfg["embedding"]["embeddings"].values():
        if isinstance(st, dict) and isinstance(st.get("net"), dict):
            st["net"].update({"depth": 4, "hidden_channels": 32,
                              "skips": [2]})
    return convert_epochs_to_iters(cfg, iters_per_epoch=1000)


def rays_batch(n, degenerate=False, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    o[:, 2] = -1.2
    d = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    d[:, 2] = 1.0
    if degenerate:
        # rays straight through the origin: pluecker cross products
        # vanish -> safe_norm eps path
        o[:4] = np.array([0.0, 0.0, -1.2], np.float32)
        d[:4] = np.array([0.0, 0.0, 1.0], np.float32)
        d[4:8, 2] = 0.0  # d_z = 0 degenerate plane intersections
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    return jnp.asarray(np.concatenate([o, d], -1))


def drive(name, expect_near_sensitivity=False):
    cfg = shrink(reference_yaml.reference_model_cfg(name))
    model = build_model(cfg, dataset_info=INFO)
    params = model.init(jax.random.PRNGKey(0))
    rays = rays_batch(4096, degenerate=True)
    ctx = make_ctx(it=0, training=False)
    out = jax.jit(lambda p, r: model.apply(p, r, ctx)["rgb"])(params, rays)
    out = np.asarray(out)
    assert out.shape == (4096, 3), out.shape
    assert np.isfinite(out).all(), f"{name}: non-finite fwd"
    log(f"{name}: fwd finite, rgb mean {out.mean():.4f}")

    def loss(p):
        ctx_t = make_ctx(it=0, training=True)
        return jnp.mean(model.apply(p, rays, ctx_t)["rgb"] ** 2)
    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    bad = [np.asarray(x) for x in leaves if not bool(jnp.isfinite(x).all())]
    assert not bad, f"{name}: non-finite grads"
    log(f"{name}: grad finite over {len(leaves)} leaves")

    if expect_near_sensitivity:
        # same config with near pinned to 0 must differ (the mask is live)
        cfg0 = shrink(reference_yaml.reference_model_cfg(name))
        for st in cfg0["embedding"]["embeddings"].values():
            if isinstance(st, dict) and isinstance(st.get("intersect"),
                                                   dict):
                st["intersect"]["near"] = 0.0
        model0 = build_model(cfg0, dataset_info=INFO)
        out0 = np.asarray(jax.jit(
            lambda p, r: model0.apply(p, r, ctx)["rgb"])(params, rays))
        diff = np.abs(out - out0).max()
        log(f"{name}: near=dataset vs near=0 max diff {diff:.3e}")
        assert diff > 1e-6, "near mask is dead — change not exercised"


def main():
    log("devices:", jax.devices())
    drive("donerf_cylinder", expect_near_sensitivity=True)
    drive("catacaustics_distance")
    drive("donerf_voxel")

    # voxel anchors actually moved to the bbox
    from hyperreel_tpu.models.intersect import IntersectVoxelGrid
    iv = IntersectVoxelGrid(
        z_channels=12,
        cfg={"use_dataset_bounds": True,
             "_dataset_bbox": (INFO["bbox"][0], INFO["bbox"][1])})
    assert np.allclose(iv.samples[0], INFO["bbox"][0]), iv.samples[0]
    assert np.allclose(iv.samples[-1], INFO["bbox"][1]), iv.samples[-1]
    log("voxel anchors span the dataset bbox: OK")
    log("ALL OK")


if __name__ == "__main__":
    main()
