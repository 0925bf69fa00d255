"""Clean device trace of the fused path: warm, trace one executed call,
sum device-stream op durations by name."""

import collections
import glob
import gzip
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "experiments")
from exp_fused_tpu import build, rays_chunk


def log(*a):
    print(*a, flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fused"
    fn, params = build(which == "fused")
    it = jnp.asarray(0, jnp.int32)
    rng = jax.random.PRNGKey(1)
    rays = rays_chunk(1 << 18)
    jf = jax.jit(fn)
    out = jf(params, rays, it, rng)
    out.block_until_ready()
    out = jf(params, rays.at[0, 0].add(1e-5), it, rng)
    out.block_until_ready()

    d = f"/tmp/trace2_{which}"
    with jax.profiler.trace(d):
        out = jf(params, rays.at[0, 1].add(1e-5), it, rng)
        out.block_until_ready()

    files = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as fh:
        tr = json.load(fh)

    # device lanes: pick pids whose process name mentions TPU/device
    pid_names = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    log("processes:", pid_names)

    tot = collections.Counter()
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids \
                and "dur" in ev:
            tot[ev.get("name", "?")] += ev["dur"]
            total += ev["dur"]
    log(f"== {which}: device op time total {total/1e3:.1f} ms ==")
    for k, v in tot.most_common(25):
        log(f"  {v/1e3:9.3f} ms  {k[:100]}")


if __name__ == "__main__":
    main()
