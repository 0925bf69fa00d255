"""Round-4 verify drive (verify skill): exercises this round's changed
pieces end-to-end on the REAL TPU.

1. phase-major patch path: parity vs the general path on coherent rays
   (incl. degenerate d_z rows), kernel-engagement spy, finiteness.
2. n_to_reso float32 semantics: exact-cube case must give 24 not 23.
3. dataset-bbox plumbing: voxel_grid use_dataset_bounds forward + grad
   finiteness through a donerf_voxel-style config.
4. patch perf: megapixel streaming quad vs patch (same process).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def check_n_to_reso():
    from hyperreel_tpu.models.tensorf import n_to_reso
    r = n_to_reso(13824, ([-2.0] * 3, [2.0] * 3))
    assert r == [24, 24, 24], r
    log("n_to_reso f32 exact-cube: OK", r)


def check_voxel_bbox():
    from hyperreel_tpu.configs import reference_yaml
    from hyperreel_tpu.configs.presets import convert_epochs_to_iters
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import make_ctx

    cfg = reference_yaml.reference_model_cfg("donerf_voxel")
    net = cfg["color"]["net"]
    net["N_voxel_init"] = 24 ** 3
    net["N_voxel_final"] = 24 ** 3
    net["upsamp_list"] = []
    net["update_AlphaMask_list"] = []
    for st in cfg["embedding"]["embeddings"].values():
        if isinstance(st, dict) and isinstance(st.get("net"), dict):
            st["net"].update({"depth": 4, "hidden_channels": 32,
                              "skips": [2]})
        if isinstance(st, dict) and st.get("z_channels"):
            st["z_channels"] = 12
    cfg = convert_epochs_to_iters(cfg, iters_per_epoch=1000)
    info = {"num_keyframes": 1, "num_frames": 1, "num_views": 4,
            "near": 0.5, "far": 6.0, "depth_range": (1.0, 8.0),
            "bbox": (np.array([-1.5, -1.25, -1.75], np.float32),
                     np.array([1.25, 1.75, 1.5], np.float32))}
    model = build_model(cfg, dataset_info=info)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    o = rng.uniform(-0.3, 0.3, (4096, 3)).astype(np.float32)
    o[:, 2] = -1.2
    d = rng.uniform(-0.4, 0.4, (4096, 3)).astype(np.float32)
    d[:, 2] = 1.0
    rays = jnp.asarray(np.concatenate([o, d], -1))
    ctx = make_ctx(it=0, training=False)
    out = model.apply(params, rays, ctx)["rgb"]
    assert bool(jnp.isfinite(out).all()), "voxel fwd non-finite"

    def loss(p):
        ctx_t = make_ctx(it=0, training=True)
        return jnp.mean(model.apply(p, rays, ctx_t)["rgb"] ** 2)
    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves), \
        "voxel grad non-finite"
    log(f"voxel_grid dataset-bbox fwd+grad finite on "
        f"{jax.devices()[0].platform}: OK ({len(leaves)} grad leaves)")


def main():
    log("devices:", jax.devices())
    check_n_to_reso()
    check_voxel_bbox()
    # patch parity + perf reuse the existing harness parts
    sys.path.insert(0, "experiments")
    import verify_patch_hw
    verify_patch_hw.part_parity()
    verify_patch_hw.part_perf()
    log("ROUND4 DRIVE OK")


if __name__ == "__main__":
    main()
