"""Full-model A/B of the channels-first eval pipeline
(models/fused_eval.py) vs the round-2 ray-major fused path, on the real
TPU at the bench chunk shape (262144 rays): numerical parity + device
trace per path (chained-wall timing through the tunnel is untrustworthy;
PERFORMANCE.md).

  python experiments/exp_cf_model.py [cf|rm|both|parity]
"""

import collections
import glob
import gzip
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def build(mode):
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx

    cfg = convert_epochs_to_iters(technicolor_z_plane(), 4000)
    cfg["color"]["net"]["fused_render"] = True
    cfg["color"]["net"]["fused_render_cf"] = (mode == "cf")
    info = {"num_keyframes": 4, "num_frames": 50, "num_views": 16}
    model = build_model(cfg, dataset_info=info,
                        compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    if mode == "cf":
        assert model._cf_eval is not None, "CF path not selected!"

    def fn(params, rays, it, rng):
        ctx = StepCtx(it=it, rng=rng, training=False)
        return model.apply(params, rays, ctx)["rgb"]

    return fn, params


def rays_chunk(n, seed=0):
    side = int(np.sqrt(n))
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    cam = np.full((n, 1), 3.0, np.float32)
    t = np.full((n, 1), 0.3, np.float32)
    return jnp.asarray(np.concatenate([o, d, cam, t], -1))


def trace_path(mode, rays, it, rng):
    fn, params = build(mode)
    jf = jax.jit(fn)
    out = jf(params, rays, it, rng)
    out.block_until_ready()
    out = jf(params, rays.at[0, 0].add(1e-5), it, rng)
    out.block_until_ready()
    d = f"/tmp/cfmodel_{mode}"
    with jax.profiler.trace(d):
        out = jf(params, rays.at[0, 1].add(1e-5), it, rng)
        out.block_until_ready()
    files = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as fh:
        tr = json.load(fh)
    pid_names = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    tot = collections.Counter()
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids and "dur" in ev:
            tot[ev.get("name", "?")] += ev["dur"]
            total += ev["dur"]
    log(f"== {mode}: {total/1e3:.2f} ms device total "
        f"({rays.shape[0]/(total/1e6)/1e6:.2f} Mrays/s)")
    for k, v in tot.most_common(20):
        log(f"   {v/1e3:8.2f} ms  {k}")
    return total / 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    log("devices:", jax.devices())
    it = jnp.asarray(0, jnp.int32)
    rng = jax.random.PRNGKey(1)
    n = 1 << 18
    rays = rays_chunk(n)

    if which == "parity" or which == "both":
        fn_cf, p_cf = build("cf")
        fn_rm, p_rm = build("rm")
        small = rays[:4096]
        a = np.asarray(jax.jit(fn_cf)(p_cf, small, it, rng))
        b = np.asarray(jax.jit(fn_rm)(p_rm, small, it, rng))
        log("parity max |cf - rm|:", float(np.abs(a - b).max()))

    if which in ("cf", "both"):
        trace_path("cf", rays, it, rng)
    if which in ("rm", "both"):
        trace_path("rm", rays, it, rng)


if __name__ == "__main__":
    main()
