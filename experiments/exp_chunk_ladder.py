"""Chunk-size ladder for the headline bench shape (round 3c).

The pack-build kernel removed the biggest CF-tail temporaries, so the
old 262144-ray chunk ceiling (set pre-kernel by the quad-unpack
temporaries, PERFORMANCE.md "1M-ray render chunks: OOM") may have
moved. Bigger chunks amortize per-chunk glue (MLP launch, output clip,
lax.map step overhead) over more rays.

Measures the full-32 flagship (the honest headline config) on a real
megapixel pinhole frame at (chunk, chunks_per_call) points; same
tunnel-safe streaming timing as bench.py. OOM points are caught and
reported.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    from __graft_entry__ import entry

    log("devices:", jax.devices())
    fn, (params, _, it, rng) = entry()

    n = 1 << 20
    side = 1 << 10
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    cam = np.full((n, 1), 3.0, np.float32)
    t = np.full((n, 1), 0.3, np.float32)
    frame_np = np.concatenate([o, d, cam, t], -1).astype(np.float32)

    for chunk_log2 in (17, 18, 19, 20):
        chunk = 1 << chunk_log2
        k = n // chunk
        frame = jnp.asarray(frame_np).reshape(k, chunk, -1)

        def render_frame(params, chunks, it, rng):
            return jax.lax.map(lambda rr: fn(params, rr, it, rng), chunks)

        try:
            jitted = jax.jit(render_frame)
            out = jitted(params, frame, it, rng)
            out.block_until_ready()
            n_timed = 6
            variants = [frame.at[0, 0, 0].add(1e-6 * (i + 1))
                        for i in range(n_timed)]
            for v in variants:
                float(v[0, 0, 0])
            out = jitted(params, variants[0], it, rng)
            float(out[0, 0, 0])
            t0 = time.perf_counter()
            outs = [jitted(params, v, it, rng) for v in variants]
            float(outs[-1][0, 0, 0])
            dt = (time.perf_counter() - t0) / n_timed
            log(json.dumps({"chunk": chunk, "chunks_per_call": k,
                            "mrays_per_sec": round(n / dt / 1e6, 2)}))
        except Exception as e:  # noqa: BLE001 — OOM reporting
            log(json.dumps({"chunk": chunk, "error": str(e)[:200]}))


if __name__ == "__main__":
    sys.exit(main())
