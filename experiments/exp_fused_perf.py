"""Isolate where the fused path's time goes: (1) standalone kernel at
bench scale over tile sizes, (2) device trace of the full fused model
call vs the reference path."""

import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def kernel_sweep():
    from hyperreel_tpu.ops.pallas.shade import fused_shade_composite
    B, S, C = 1 << 18, 32, 16
    N = B * S
    W = H = 203
    TW, TH = 101, 4
    rt0 = (TH + 2) * (TW + 2)
    Rt = ((rt0 + 127) // 128) * 128

    # generate inputs ON DEVICE — multi-GB host->device transfers crawl
    # through the axon tunnel
    ks = list(jax.random.split(jax.random.PRNGKey(0), 16))
    gen = jax.jit(lambda k, lo, hi: jax.random.uniform(
        k, (N,), jnp.float32, lo, hi))
    rows = jax.jit(lambda k: jax.random.normal(
        k, (N, 4 * C), jnp.bfloat16))(ks[0])
    xn, yn, zn, tn = (gen(ks[i + 1], -1, 1) for i in range(4))
    valid = jnp.ones((N,), jnp.float32)
    cs = tuple(gen(ks[5 + i], -0.1, 0.1) for i in range(3))
    csh = tuple(gen(ks[8 + i], -0.1, 0.1) for i in range(3))
    dists = jax.jit(lambda k: jnp.sort(jax.random.uniform(
        k, (B, S), jnp.float32, 0.1, 4.0), 1))(ks[11])
    shb = jax.jit(lambda k: jax.random.normal(
        k, (B, 9), jnp.float32))(ks[12])
    ttab = jax.jit(lambda k: jax.random.normal(
        k, (Rt, C), jnp.float32))(ks[13])
    wb = jax.jit(lambda k: jax.random.normal(
        k, (C, 27), jnp.float32))(ks[14])

    args = (rows, yn, zn, tn, valid, *cs, *csh, dists, shb, ttab, wb)

    for tile in (32, 64, 128, 256):
        try:
            # everything an explicit jit arg — closed-over device arrays
            # become jaxpr CONSTANTS and get serialized through the remote
            # AOT compile helper (GBs -> endless compiles)
            def call(xnv, rows, yn, zn, tn, valid, c0, c1, c2, h0, h1, h2,
                     dists, shb, ttab, wb, tile=tile):
                return fused_shade_composite(
                    rows, xnv, yn, zn, tn, valid, (c0, c1, c2),
                    (h0, h1, h2), dists, shb, ttab, wb,
                    W=W, H=H, TW=TW, TH=TH, n_density=8,
                    density_shift=0.0, distance_scale=16.0, tile=tile)
            f = jax.jit(call)
            out = f(xn, *args)
            out.block_until_ready()

            def run(k):
                t0 = time.perf_counter()
                x = xn
                o = None
                for i in range(k):
                    x = x.at[0].add(1e-6 if o is None else o[0, 0] * 1e-9)
                    o = f(x, *args)
                float(o[0, 0])
                return time.perf_counter() - t0
            run(1)
            t1, t2 = run(3), run(9)
            dt = (t2 - t1) / 6
            log(f"tile={tile:>4}: {dt*1e3:7.1f} ms -> "
                f"{B/dt/1e6:6.2f} Mrays/s  (kernel only + aux transfer)")
        except Exception as e:
            log(f"tile={tile:>4}: FAILED {type(e).__name__}: "
                f"{str(e)[:150]}")


def trace_paths():
    import glob
    import gzip
    import json
    import collections
    import sys
    sys.path.insert(0, "experiments")
    from exp_fused_tpu import build, rays_chunk

    it = jnp.asarray(0, jnp.int32)
    rng = jax.random.PRNGKey(1)
    rays = rays_chunk(1 << 18)

    for name, fused in (("fused", True), ("reference", False)):
        fn, params = build(fused)
        jf = jax.jit(fn)
        out = jf(params, rays, it, rng)
        out.block_until_ready()
        d = f"/tmp/trace_{name}"
        with jax.profiler.trace(d):
            out = jf(params, rays.at[0, 0].add(1e-6), it, rng)
            out.block_until_ready()
        files = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
        if not files:
            log(f"{name}: no trace file")
            continue
        with gzip.open(sorted(files)[-1], "rt") as fh:
            tr = json.load(fh)
        tot = collections.Counter()
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                cat = ev.get("pid")
                nm = ev.get("name", "")
                tot[nm] += ev["dur"]
        top = tot.most_common(18)
        log(f"== {name} top ops (us) ==")
        for k, v in top:
            log(f"  {v:>9} {k[:110]}")


if __name__ == "__main__":
    log("devices:", jax.devices())
    kernel_sweep()
    trace_paths()
    log("DONE")
