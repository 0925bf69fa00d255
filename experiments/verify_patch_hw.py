"""Verify drive: coherent patch-gather path on the REAL TPU.

Parts (arg = parity | perf | quality, default parity):
  parity  — flagship init weights, high-density scanline rays: patch
            path vs general path rgb parity (2e-4), finiteness incl.
            degenerate d_z rows, kernel-engagement spy.
  perf    — megapixel-frame streaming throughput, quad vs patch (same
            process), full 32 samples.
  quality — train 600 iters on the 96^2 blob (TPU), then render a
            512^2 view of the SAME scene (production pixel density):
            PSNR quad vs patch vs GT + the measured violation rate.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def scanline_rays(n, side=4096, t=0.3):
    fov_px = side * 1.2
    u = (np.arange(n, dtype=np.float32) - n / 2) / fov_px
    v = np.full(n, 16.0 / fov_px, np.float32)
    d = np.stack([u, v, np.ones_like(u)], -1)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    return np.concatenate(
        [o, d, np.full((n, 1), 3.0, np.float32),
         np.full((n, 1), t, np.float32)], -1).astype(np.float32)


def frame_rays():
    n, side = 1 << 20, 1 << 10
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    return np.concatenate(
        [o, d, np.full((n, 1), 3.0, np.float32),
         np.full((n, 1), 0.3, np.float32)], -1).astype(np.float32), n


def stream(fn, params, frame_np, it, rng, chunk=1 << 18):
    n = len(frame_np)
    frame = jnp.asarray(frame_np).reshape(n // chunk, chunk, -1)
    jitted = jax.jit(lambda p, c, i, r: jax.lax.map(
        lambda rr: fn(p, rr, i, r), c))
    out = jitted(params, frame, it, rng)
    out.block_until_ready()
    variants = [frame.at[0, 0, 0].add(1e-6 * (i + 1)) for i in range(6)]
    for v in variants:
        float(v[0, 0, 0])
    t0 = time.perf_counter()
    outs = [jitted(params, v, it, rng) for v in variants]
    float(outs[-1][0, 0, 0])
    return n / ((time.perf_counter() - t0) / 6)


def part_parity():
    import copy

    import hyperreel_tpu.ops.pallas.patch_blend as PBL
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters, with_coherent_gather)
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx

    calls = []
    orig = PBL.patch_blend

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)
    PBL.patch_blend = spy

    base = convert_epochs_to_iters(technicolor_z_plane(), 4000)
    base["color"]["net"]["fused_render"] = True
    info = {"num_keyframes": 4, "num_frames": 50, "num_views": 16}
    m_p = build_model(with_coherent_gather(base), dataset_info=info,
                      compute_dtype=jnp.bfloat16)
    assert m_p._cf_eval is not None and m_p._cf_eval.patch_cfg == (4, 3)
    cfg_g = copy.deepcopy(base)
    cfg_g["color"]["net"]["fused_render"] = False
    cfg_g["color"]["net"]["fused_render_cf"] = False
    m_g = build_model(cfg_g, dataset_info=info, compute_dtype=jnp.bfloat16)
    params = m_p.init(jax.random.PRNGKey(0))
    rays_np = scanline_rays(4096)
    rays_np[-8:, 5] = 0.0                    # degenerate d_z tail block
    rays = jnp.asarray(rays_np)

    for it in (0, 5000):
        ctx = StepCtx(it=jnp.int32(it), rng=jax.random.PRNGKey(1),
                      training=False)
        a = np.asarray(m_p.apply(params, rays, ctx)["rgb"])
        b = np.asarray(m_g.apply(params, rays, ctx)["rgb"])
        assert np.isfinite(a).all() and np.isfinite(b).all(), it
        err = np.abs(a[:-8] - b[:-8]).max()
        log(f"it={it}: max |patch - general| (coherent rays) = {err:.3e}")
        assert err < 2e-4, err
    assert calls, "patch_blend never invoked"
    log(f"patch_blend invoked {len(calls)}x; PARITY OK")


def part_perf():
    from __graft_entry__ import entry

    frame_np, n = frame_rays()
    for label, kw in (("quad", {}), ("patch", {"coherent_gather": True})):
        fn, (params, _, it, rng) = entry(**kw)
        rps = stream(fn, params, frame_np, it, rng)
        log(json.dumps({"mode": label,
                        "mrays_per_sec": round(rps / 1e6, 2)}))


def part_quality():
    sys.path.insert(0, "experiments")
    from exp_preset_sweep import _training_cfg, _mid_scale
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters, with_coherent_gather)
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults
    from hyperreel_tpu.train.render import Renderer
    from hyperreel_tpu.train.metrics import psnr

    ds = gaussian_blob_scene(n_views=8, wh=(96, 96), dynamic=True)
    cfg = _mid_scale(
        convert_epochs_to_iters(technicolor_z_plane(), iters_per_epoch=200))
    model = build_model(cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
    trainer = Trainer(model, _training_cfg(),
                      regularizer_cfgs=tv_4000_defaults(),
                      iters_per_epoch=200)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def batches():
        for b in ds.batch_iterator(8192, seed=0):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    t0 = time.time()
    state, _ = trainer.fit(state, batches(), num_iters=600,
                           rng=jax.random.PRNGKey(1))
    log(f"trained 600 iters in {time.time() - t0:.0f}s")

    # production-density eval: the SAME scene at 512^2 (same seed/FOV)
    ds_hi = gaussian_blob_scene(n_views=8, wh=(512, 512), dynamic=True)
    hold = ds_hi.image(4 * ds_hi.num_frames)
    gt = np.asarray(hold["rgb"])
    rays = jnp.asarray(hold["rays"])

    m_patch = build_model(with_coherent_gather(cfg), dataset_info=ds.info(),
                          compute_dtype=jnp.bfloat16)
    for label, m in (("quad", model), ("patch", m_patch)):
        r = Renderer(m, ray_chunk=1 << 15)
        pred = np.asarray(
            r.render_rays(state.params, rays, it=state.it)["rgb"])
        log(json.dumps({"mode": label,
                        "psnr_512": round(float(psnr(pred, gt)), 2)}))


if __name__ == "__main__":
    part = sys.argv[1] if len(sys.argv) > 1 else "parity"
    log("devices:", jax.devices())
    {"parity": part_parity, "perf": part_perf,
     "quality": part_quality}[part]()
