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

    n_timed = 3
    t0 = time.perf_counter()
    for _ in range(n_timed):
        for _ in range(n // chunk):
            out = jitted(params, chunk_rays, it, rng)
    out.block_until_ready()
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
