"""HW verify: prepare_eval serving path on the flagship dynamic model.

Checks on the real TPU:
  * prepare_eval returns table arrays; apply(cf_prepared=...) matches the
    default in-trace-build apply bitwise-close;
  * finiteness incl. degenerate d_z rays;
  * frame timing with vs without prepared tables (pipelined, distinct
    inputs, value-readback stop clock — tunnel-safe methodology).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    from __graft_entry__ import entry
    from hyperreel_tpu.models.ctx import StepCtx

    log("devices:", jax.devices())
    fn, (params, rays, it, rng) = entry()

    # rebuild the model handle from entry's closure (entry returns fn only);
    # easier: rebuild the same model here
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.models.model import build_model
    cfg = convert_epochs_to_iters(technicolor_z_plane(), iters_per_epoch=4000)
    info = {"num_keyframes": 4, "num_frames": 50, "num_views": 16}
    model = build_model(cfg, dataset_info=info, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    assert model._cf_eval is not None

    prep = model.prepare_eval(params)
    assert prep is not None
    tables, second, wb_t = prep
    log("prepared: tables", [t.shape for t in tables],
        "second", [s.shape for s in second], "wb_t", wb_t.shape)

    # parity on a small batch incl. degenerate dz
    n = 4096
    r = np.random.default_rng(0)
    o = r.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    o[:, 2] -= 1.5
    d = r.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    d[:, 2] = 1.0
    d[-8:, 2] = 0.0
    cam = r.integers(0, 16, (n, 1)).astype(np.float32)
    t = r.uniform(0, 1, (n, 1)).astype(np.float32)
    small = jnp.asarray(np.concatenate([o, d, cam, t], -1))

    def fwd(params, prepared, rays, it):
        ctx = StepCtx(it=it, rng=jax.random.PRNGKey(1), training=False)
        rk = {"cf_prepared": prepared} if prepared is not None else None
        return model.apply(params, rays, ctx, render_kwargs=rk)["rgb"]

    f_prep = jax.jit(fwd)
    f_raw = jax.jit(lambda p, r_, i: fwd(p, None, r_, i))
    a = np.asarray(f_prep(params, prep, small, jnp.int32(0)))
    b = np.asarray(f_raw(params, small, jnp.int32(0)))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    log("max |prepared - in-trace| =", np.abs(a - b).max())
    assert np.abs(a - b).max() < 1e-5

    # frame timing: megapixel frame as lax.map over 4 chunks (bench shape)
    chunk = 1 << 18
    nfr = 1 << 20
    k = nfr // chunk
    side = 1 << 10
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / (side * 1.2)
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    cam = np.full((nfr, 1), 3.0, np.float32)
    t = np.full((nfr, 1), 0.3, np.float32)
    frame = jnp.asarray(
        np.concatenate([o, d, cam, t], -1).astype(np.float32)
    ).reshape(k, chunk, -1)

    def frame_fwd(params, prepared, chunks, it):
        def one(rays):
            return fwd(params, prepared, rays, it)
        return jax.lax.map(one, chunks)

    j_prep = jax.jit(frame_fwd)
    j_raw = jax.jit(lambda p, c, i: frame_fwd(p, None, c, i))

    def time_variant(name, call):
        out = call(frame, jnp.int32(0))
        float(out[0, 0, 0])
        n_timed = 8
        variants = [frame.at[0, 0, 0].add(1e-6 * (i + 1))
                    for i in range(n_timed)]
        for v in variants:
            float(v[0, 0, 0])
        t0 = time.perf_counter()
        outs = [call(v, jnp.int32(0)) for v in variants]
        float(outs[-1][0, 0, 0])
        dt = (time.perf_counter() - t0) / n_timed
        log(f"{name}: {dt * 1e3:.2f} ms/frame = "
            f"{nfr / dt / 1e6:.2f} Mrays/s")
        return dt

    # order: raw first, prep second, then repeat reversed (first-measured
    # variant in a fresh process reads inflated — PERFORMANCE.md)
    time_variant("in-trace (warm0)", lambda c, i: j_raw(params, c, i))
    d_prep = time_variant("prepared", lambda c, i: j_prep(params, prep, c, i))
    d_raw = time_variant("in-trace", lambda c, i: j_raw(params, c, i))
    d_prep2 = time_variant("prepared2", lambda c, i: j_prep(params, prep, c, i))
    log(f"delta (in-trace - prepared): "
        f"{(d_raw - min(d_prep, d_prep2)) * 1e3:.2f} ms/frame")
    log("prepared-path HW OK")


if __name__ == "__main__":
    sys.exit(main())
