"""Multi-axis family Pareto ladders (VERDICT r4 item 6 / round 5).

The flagship's reduced-sample Pareto methodology (PERFORMANCE.md:
compact-k = post-sort first-k, stride = inference_samples) applied to
the MAJORITY families — llff-class static ([8,4,4] NoSample, 32
no_sample yamls) and neural_3d-class dynamic (z=64, 18 time yamls):

  per family: train 600 iters on the blob scene at mid scale, then
  measure holdout PSNR + megapixel-frame streaming throughput for
    full | compact {z/2, z/4} | stride {2, 4}
  on the family's production fast route (fused + coherent patch
  (3,2); n3d additionally rides HYPERREEL_EVAL_TILE=128 — the HW-
  verified two-kernel route, multiaxis_patch3_nofuse.log), plus the
  per-family COVERAGE-WITNESS gate check (scanline rays -> viol == 0,
  scattered rays -> viol > 0) that the viewer's probe gate relies on.

Usage: python experiments/exp_multiaxis_pareto.py llff|n3d
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def make_frame(dynamic):
    n = 1 << 20
    side = 1 << 10
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    dd = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    oo = np.zeros_like(dd)
    oo[:, 2] = -1.5
    cols = [oo, dd]
    if dynamic:
        cols += [np.full((n, 1), 3.0, np.float32),
                 np.full((n, 1), 0.3, np.float32)]
    return np.concatenate(cols, -1), n


def scattered_rays(n, dynamic, seed=7):
    rng = np.random.default_rng(seed)
    d = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    d[:, 2] = 1.0
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    cols = [o, d]
    if dynamic:
        cols += [np.zeros((n, 1), np.float32),
                 np.full((n, 1), 0.3, np.float32)]
    return np.concatenate(cols, -1)


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "llff"
    sys.path.insert(0, "experiments")
    from exp_preset_sweep import _training_cfg, _mid_scale
    from hyperreel_tpu.configs.presets import (
        llff_z_plane, neural_3d_z_plane, convert_epochs_to_iters,
        with_compact_samples, with_inference_samples,
        with_coherent_gather)
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults
    from hyperreel_tpu.train.render import Renderer
    from hyperreel_tpu.train.metrics import psnr

    dynamic = family == "n3d"
    preset = neural_3d_z_plane if dynamic else llff_z_plane
    z_full = 64 if dynamic else 32
    # NOTE: no HYPERREEL_EVAL_TILE force. The round-5 first runs forced
    # 128 to chase the published exp_multiaxis_patch tile128 rows, but
    # that bypasses pick_tile's structural VMEM cap and the n3d
    # holdout render (z=64, un-premixed, chunk 2^15) OOMs the Mosaic
    # scoped vmem at that width (pareto_n3d3.log) — the pareto must
    # measure the SHIPPING default route, which picks its tile.

    log("devices:", jax.devices(), "family:", family)

    ds = gaussian_blob_scene(n_views=8, wh=(96, 96), dynamic=dynamic)
    W, H = ds.img_wh
    npix = W * H
    hold_img = (4 * ds.num_frames) if dynamic else 4
    hold = ds.image(hold_img)
    keep = np.ones(len(ds.all_coords), bool)
    keep[hold_img * npix:(hold_img + 1) * npix] = False
    ds.all_coords = ds.all_coords[keep]
    ds.all_rgb = ds.all_rgb[keep]

    base_cfg = _mid_scale(
        convert_epochs_to_iters(preset(), iters_per_epoch=200))
    # invalid_sort_far only for the compact rows: compact-k requires it
    # (first-k after an invalid-last sort), but it is CF-INCOMPATIBLE
    # with contraction (fused_eval.cf_eligible: the far sentinel would
    # contract onto the radius-2 sphere) and BOTH llff and n3d presets
    # contract (mipnerf) — so compact rows for these families ride the
    # general path; full/stride rows ride CF + patch.
    import copy as _copy
    compact_base = _copy.deepcopy(base_cfg)
    compact_base["embedding"]["embeddings"]["ray_intersect_0"][
        "intersect"]["invalid_sort_far"] = True
    model = build_model(base_cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
    trainer = Trainer(model, _training_cfg(),
                      regularizer_cfgs=tv_4000_defaults(),
                      iters_per_epoch=200)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def batches(seed=0):
        for b in ds.batch_iterator(8192, seed=seed):
            yield {k: jnp.asarray(v) for k, v in b.items()}

    log(f"[{family}] training 600 iters @ {z_full} samples...")
    t0 = time.time()
    state, _ = trainer.fit(state, batches(), num_iters=600,
                           rng=jax.random.PRNGKey(1))
    log(f"[{family}] trained in {time.time() - t0:.0f}s")

    frame_np, n = make_frame(dynamic)

    def measure(cfg, label, k, patch=(3, 2), block=4):
        """Holdout PSNR on the GENERAL path + streaming throughput on
        the fast route (fused + patch) with trained params grafted."""
        m_k = build_model(cfg, dataset_info=ds.info(),
                          compute_dtype=jnp.bfloat16)
        init_p = m_k.init(jax.random.PRNGKey(0))
        emb = dict(init_p["embedding"])
        emb.update(state.params["embedding"])
        params_k = dict(state.params, embedding=emb)

        renderer = Renderer(m_k, ray_chunk=1 << 15)
        pred = renderer.render_rays(params_k, jnp.asarray(hold["rays"]),
                                    it=state.it)["rgb"]
        val = float(psnr(np.asarray(pred), np.asarray(hold["rgb"])))

        import copy

        def build_fast(p):
            if p is None:
                c2 = copy.deepcopy(cfg)
            else:
                c2 = with_coherent_gather(copy.deepcopy(cfg), *p,
                                          block=block)
            c2["color"]["net"]["fused_render"] = True
            m = build_model(c2, dataset_info=ds.info(),
                            compute_dtype=jnp.bfloat16)
            ip = m.init(jax.random.PRNGKey(0))
            ef = dict(ip["embedding"])
            ef.update(state.params["embedding"])
            return m, dict(state.params, embedding=ef)

        # PRODUCTION exactness gate (bench.py / viewer probe): the
        # patch path ships only when the coverage witness passes the
        # calibrated 1e-4 gate at the target pixel density — coverage
        # is geometry-dependent (ops/patch_gather.py), and these
        # families' mid-scale planes are denser per pixel than the
        # flagship's, so a shape that is exact on the flagship can
        # violate here (llff (3,2) R=4 measured 6.6e-3). Auto-WIDEN
        # through a shape ladder; quad fallback when none passes —
        # the row then reports what production would actually ship.
        ladder = [patch] + [s for s in ([(4, 3), (5, 3)] if block == 4
                                        else [(6, 3), (7, 3)])
                            if s != patch] + [None]
        ctx0 = StepCtx(it=jnp.asarray(state.it, jnp.int32),
                       rng=jax.random.PRNGKey(0), training=False)
        # probe at the FULL timing chunk size: pick_tile depends on B,
        # so a shape that lowers at a small probe batch can still VMEM
        # OOM at the 2^18 chunk (n3d R=8 tile128, pareto_n3d2.log) —
        # the probe must compile the same kernel config as the timing
        sl = jnp.asarray(frame_np[: 1 << 18])
        viol = 0.0
        for patch in ladder:
            m_f, params_f = build_fast(patch)
            if patch is None:
                break
            try:
                viol = float(m_f.apply(params_f, sl, ctx0).get(
                    "patch_coverage_viol", 0.0))
            except Exception as e:  # noqa: BLE001 - shape may not lower
                log(f"[{family}] {label}: patch {patch} COMPILE FAIL "
                    f"({type(e).__name__}) -> widen/fallback")
                continue
            if viol <= 1e-4:
                break
            log(f"[{family}] {label}: patch {patch} viol {viol:.2e} "
                f"> 1e-4 gate -> widen/fallback")

        def fn(params, rays, itv, rng):
            ctx = StepCtx(it=itv, rng=rng, training=False)
            return m_f.apply(params, rays, ctx)["rgb"]

        chunk = 1 << 18
        frame = jnp.asarray(frame_np).reshape(n // chunk, chunk, -1)
        jitted = jax.jit(lambda p, c, i, r: jax.lax.map(
            lambda rr: fn(p, rr, i, r), c))
        it_dev = jnp.asarray(state.it, jnp.int32)
        rng = jax.random.PRNGKey(0)
        out = jitted(params_f, frame, it_dev, rng)
        jax.block_until_ready(out)
        n_timed = 6
        variants = [frame.at[0, 0, 0].add(1e-6 * (i + 1))
                    for i in range(n_timed)]
        for v in variants:
            float(v[0, 0, 0])
        t0 = time.perf_counter()
        outs = [jitted(params_f, v, it_dev, rng) for v in variants]
        float(outs[-1][0, 0, 0])
        dt = (time.perf_counter() - t0) / n_timed
        log(json.dumps({"family": family, "mode": label, "k": k,
                        "patch": list(patch) if patch else "quad",
                        "block": block, "viol": round(viol, 6),
                        "holdout_psnr": round(val, 2),
                        "rays_per_sec": round(n / dt, 1)}))
        return m_f, params_f

    m_f, params_f = measure(base_cfg, "full", z_full)
    # R=8 coherent blocks (round 5): one patch row per axis serves 8
    # consecutive rays — halves the multi families' 3-axis gather
    # floor. Wider (5,3) patch for the 8-pixel footprint; the in-graph
    # witness gates exactness before the timing is trusted.
    m_f8, params_f8 = measure(base_cfg, "full-r8", z_full,
                              patch=(5, 3), block=8)

    # coverage-witness separation check (the viewer probe's contract):
    # whatever shape the ladder selected must pass the calibrated gate
    # on scanline blocks AND trip it on scattered rays — if the ladder
    # fell back to quad there is no witness to check.
    ctx = StepCtx(it=jnp.asarray(state.it, jnp.int32),
                  rng=jax.random.PRNGKey(0), training=False)
    sl = jnp.asarray(frame_np[: 1 << 12])
    sc = jnp.asarray(scattered_rays(1 << 12, dynamic))
    for tag, (mm, pp) in (("full", (m_f, params_f)),
                          ("full-r8", (m_f8, params_f8))):
        out0 = mm.apply(pp, sl, ctx)
        if "patch_coverage_viol" not in out0:
            log(f"[{family}] {tag}: quad fallback (no witness)")
            continue
        v0 = float(out0["patch_coverage_viol"])
        v1 = float(mm.apply(pp, sc, ctx)["patch_coverage_viol"])
        log(f"[{family}] {tag} witness: scanline {v0:.2e} "
            f"(gate 1e-4), scattered {v1:.2e} (expect > gate)")
        assert v0 <= 1e-4 < v1, (tag, v0, v1)

    for k in (z_full // 2, z_full // 4):
        measure(with_compact_samples(compact_base, k), "compact", k)
    for stride in (2, 4):
        measure(with_inference_samples(base_cfg, z_full // stride),
                "stride", z_full // stride)
    log(f"[{family}] ALL OK")


if __name__ == "__main__":
    main()
