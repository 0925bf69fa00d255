"""Device trace of the SERVING patch composition (round 4b).

Exactly the bench composition: entry(prepared=True, coherent_gather,
patch_shape, compact_samples) under lax.map over 4 x 262144-ray
phase-major chunks. Attributes the (3,2) chunk budget (the new headline
default) and the (3,2)+compact16 anomaly (benched 13.67 ~= (3,2) alone,
while (4,3)+c16 = 18.09 — where does c16's sample cut go at (3,2)?).

  python experiments/exp_patch32_trace.py <px> <py> [compact_k]
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


def main():
    px, py = int(sys.argv[1]), int(sys.argv[2])
    ck = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    log("devices:", jax.devices(), "patch", (px, py), "compact", ck)
    fn, (params, rays, it, rng) = entry(
        coherent_gather=True, compact_samples=ck or None,
        prepared=True, patch_shape=(px, py))

    chunk, n, side = 1 << 18, 1 << 20, 1 << 10
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    cam = np.full((n, 1), 3.0, np.float32)
    t = np.full((n, 1), 0.3, np.float32)
    frame_np = np.concatenate([o, d, cam, t], -1).astype(np.float32)
    frame_np = frame_np.reshape(n // chunk, chunk, -1)
    # phase-major per chunk (the rays_phase_major serving contract)
    frame_np = np.ascontiguousarray(
        frame_np.reshape(n // chunk, chunk // 4, 4, -1).transpose(0, 2, 1, 3)
    ).reshape(n // chunk, chunk, -1)
    frame = jnp.asarray(frame_np)

    def render_frame(params, chunks, it, rng):
        return jax.lax.map(lambda r: fn(params, r, it, rng), chunks)

    jf = jax.jit(render_frame)
    out = jf(params, frame, it, rng)
    out.block_until_ready()
    variants = [frame.at[0, 0, 0].add(1e-6 * (i + 1)) for i in range(4)]
    for v in variants:
        float(v[0, 0, 0])
    out = jf(params, variants[0], it, rng)
    float(out[0, 0, 0])
    t0 = time.perf_counter()
    outs = [jf(params, v, it, rng) for v in variants]
    float(outs[-1][0, 0, 0])
    dt = (time.perf_counter() - t0) / 4
    log(f"frame wall {dt*1e3:.1f} ms ({n/dt/1e6:.2f} Mrays/s)")

    dd = f"/tmp/patch_trace_{px}{py}_{ck}"
    with jax.profiler.trace(dd):
        out = jf(params, frame.at[0, 1, 0].add(1e-5), it, rng)
        out.block_until_ready()
    files = glob.glob(f"{dd}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as fh:
        tr = json.load(fh)
    pid_names = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower() or "XLA" in nm}
    tot = collections.Counter()
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids \
                and "dur" in ev:
            tot[ev.get("name", "?")] += ev["dur"]
            total += ev["dur"]
    log(f"== patch({px},{py}) c{ck}: {total/1e3:.2f} ms device total "
        f"({total/1e3/4:.2f} ms/chunk)")
    for k, v in tot.most_common(25):
        log(f"   {v/1e3:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
