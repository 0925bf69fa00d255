"""Benchmark: render-path ray throughput on the flagship dynamic model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference paper claims up to 18 FPS at megapixel resolution on
an RTX 3090 (arXiv 2301.02238 abstract; BASELINE.md) => ~18 Mrays/s. The
north star (BASELINE.json) is >=4x that per TPU chip.
"""

import json
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 18e6


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, (params, rays, it, rng) = entry()

    # megapixel-scale frame (reference demo pushes 1,048,576 rays/forward,
    # scripts/demo_technicolor.sh:21-23) rendered as chunked forwards; the
    # chunk keeps peak HBM for per-sample intermediates in check
    chunk = 1 << 18
    n = 1 << 20
    reps = int(np.ceil(chunk / rays.shape[0]))
    chunk_rays = jnp.tile(rays, (reps, 1))[:chunk]

    jitted = jax.jit(fn)
    out = jitted(params, chunk_rays, it, rng)
    out.block_until_ready()

    # Honest timing through the axon tunnel: block_until_ready resolves
    # early and identical queued calls can collapse, so (a) every call gets
    # distinct inputs, (b) each call's input depends on the previous call's
    # OUTPUT (forcing real sequential execution), and (c) one final value
    # readback pays the tunnel round-trip once instead of per call.
    n_timed = 3
    n_calls = n_timed * (n // chunk)
    ray_variants = [chunk_rays.at[0, 0].add(1e-6 * (i + 1))
                    for i in range(n_calls)]
    for v in ray_variants:
        float(v[0, 0])
    out = jitted(params, ray_variants[0], it, rng)
    float(out[0, 0])  # warm chunk shape

    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(n_calls):
        v = ray_variants[i].at[0, 1].add(carry * 0.0)
        out = jitted(params, v, it, rng)
        carry = out[0, 0]
    float(carry)
    dt = (time.perf_counter() - t0) / n_timed

    rays_per_sec = n / dt
    print(json.dumps({
        "metric": "render_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
