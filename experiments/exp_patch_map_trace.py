"""Diagnose the patch-path collapse under lax.map (round 4).

bench --coherent-gather collapsed to 0.45 Mrays/s (0.025 vs_baseline)
while the SAME model/chunk traced at 25.3 ms direct-jit (~10 Mrays/s),
and patch+compact16 under the same lax.map benched fine (0.847). This
traces the patch frame (lax.map over 4 x 262144 chunks, exactly the
bench composition) and prints top device ops to attribute what the loop
body de-hoists or re-lays-out.

  python experiments/exp_patch_map_trace.py [patch|quad]
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

sys.path.insert(0, "experiments")
from exp_cf_model import log  # noqa: E402
from exp_patch_trace import build_patch  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "patch"
    log("devices:", jax.devices())
    it = jnp.asarray(0, jnp.int32)
    rng = jax.random.PRNGKey(1)

    chunk, n, side = 1 << 18, 1 << 20, 1 << 10
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    cam = np.full((n, 1), 3.0, np.float32)
    t = np.full((n, 1), 0.3, np.float32)
    frame = jnp.asarray(
        np.concatenate([o, d, cam, t], -1).astype(np.float32)
    ).reshape(n // chunk, chunk, -1)

    fn, params = build_patch(which)

    def render_frame(params, chunks, it, rng):
        return jax.lax.map(lambda r: fn(params, r, it, rng), chunks)

    jf = jax.jit(render_frame)
    out = jf(params, frame, it, rng)
    out.block_until_ready()
    # honest wall timing with distinct pre-staged inputs + value readback
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

    dd = f"/tmp/cfmodel_map_{which}"
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
    log(f"== map/{which}: {total/1e3:.2f} ms device total")
    for k, v in tot.most_common(25):
        log(f"   {v/1e3:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
