"""Round-2 wall-clock refresh for two headline claims:
1. training ms/step (steps_per_call=8, batch 16384) via post-warm
   run-length differencing with a param-value readback — fit(N) vs
   fit(N + 1024), the only method that survives the tunnel;
2. viewer-style 512x512 frame latency on the flagship via the fused eval
   path (single chunk call, value readback).
Prints one JSON line.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import sys
    sys.path.insert(0, "experiments")
    from exp_preset_sweep import _training_cfg
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults

    ds = gaussian_blob_scene(n_views=8, wh=(96, 96), dynamic=True)
    cfg = convert_epochs_to_iters(technicolor_z_plane(),
                                  iters_per_epoch=1000)
    net = cfg["color"]["net"]
    net["N_voxel_init"] = 128 ** 3
    net["N_voxel_final"] = 128 ** 3
    net["upsamp_list"] = []
    net["update_AlphaMask_list"] = []

    model = build_model(cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
    tcfg = _training_cfg()
    tcfg["batch_size"] = 16384
    trainer = Trainer(model, tcfg, regularizer_cfgs=tv_4000_defaults(),
                      iters_per_epoch=1000)

    def batches():
        for b in ds.batch_iterator(16384, seed=0):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    def timed_fit(n):
        state = trainer.init_state(jax.random.PRNGKey(0))
        t0 = time.time()
        state, _ = trainer.fit(state, batches(), num_iters=n,
                               rng=jax.random.PRNGKey(1))
        # param-value readback forces real completion through the tunnel
        float(jnp.asarray(jax.tree.leaves(state.params)[0]).ravel()[0])
        return time.time() - t0

    timed_fit(64)                      # warm compile
    t_short = timed_fit(1024)
    t_long = timed_fit(2048)
    ms_per_step = (t_long - t_short) / 1024 * 1e3

    # viewer frame: 512x512 single chunk
    side = 512
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    n = side * side
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 3.0, np.float32),
         np.full((n, 1), 0.3, np.float32)], -1))

    params = model.init(jax.random.PRNGKey(0))

    def fn(params, rays, it, rng):
        ctx = StepCtx(it=it, rng=rng, training=False)
        return model.apply(params, rays, ctx)["rgb"]

    jf = jax.jit(fn)
    it0 = jnp.asarray(0, jnp.int32)
    rng = jax.random.PRNGKey(0)
    out = jf(params, rays, it0, rng)
    out.block_until_ready()
    k = 8
    variants = [rays.at[0, 0].add(1e-6 * (i + 1)) for i in range(k)]
    for v in variants:
        float(v[0, 0])
    t0 = time.perf_counter()
    outs = [jf(params, v, it0, rng) for v in variants]
    float(outs[-1][0, 0])
    frame_ms = (time.perf_counter() - t0) / k * 1e3

    print(json.dumps({
        "train_ms_per_step_16384": round(ms_per_step, 2),
        "viewer_frame_ms_512": round(frame_ms, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
