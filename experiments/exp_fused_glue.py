"""Round-5 headline attribution: device trace + optimized-HLO source map
of the CURRENT bench-default eval chunk — coherent patch-gather (3,2),
blend+shade FUSED, prepared tables, phase-major rays — exactly the
composition behind the 15.12 Mrays/s headline. Where do the remaining
~20.4 ms - (gather + kernels) go after the round-4b fusion?

  python experiments/exp_fused_glue.py [trace|hlo|both]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

# patch shape / coherent block via the bench env knobs so the R=8
# route ((5,2) block=8) traces with the same harness
_PS = tuple(int(x) for x in os.environ.get(
    "BENCH_PATCH_SHAPE", "3,2").split(","))
_PB = int(os.environ.get("BENCH_PATCH_BLOCK", 4))


def log(*a):
    print(*a, flush=True)


def bench_chunk(chunk=1 << 18):
    """One chunk of the bench's real 1024^2 pinhole frame, phase-major."""
    side = 1 << 10
    fov_px = side * 1.2
    u = (np.arange(side, dtype=np.float32) - (side - 1) / 2) / fov_px
    uu, vv = np.meshgrid(u, u)
    d = np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3)
    o = np.zeros_like(d)
    o[:, 2] = -1.5
    n = side * side
    cam = np.full((n, 1), 3.0, np.float32)
    t = np.full((n, 1), 0.3, np.float32)
    fr = np.concatenate([o, d, cam, t], -1).astype(np.float32)
    fr = fr[:chunk]
    fr = np.ascontiguousarray(
        fr.reshape(chunk // _PB, _PB, -1).transpose(1, 0, 2)
    ).reshape(chunk, -1)
    return jnp.asarray(fr)


def build():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as GE
    fn, (params, _rays, it, rng) = GE.entry(
        coherent_gather=True, prepared=True, patch_shape=_PS,
        patch_block=_PB, uniform_time=True)
    return fn, params, it, rng


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    log("devices:", jax.devices())
    fn, params, it, rng = build()
    rays = bench_chunk()
    jf = jax.jit(fn)

    if which in ("trace", "both"):
        out = jf(params, rays, it, rng)
        out.block_until_ready()
        out = jf(params, rays.at[0, 0].add(1e-5), it, rng)
        out.block_until_ready()
        d = "/tmp/fused_glue"
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
        dev_pids = {p for p, nm in pid_names.items()
                    if "TPU" in nm or "/device" in nm.lower() or "XLA" in nm}
        tot = collections.Counter()
        total = 0.0
        for ev in tr.get("traceEvents", []):
            if (ev.get("ph") == "X" and ev.get("pid") in dev_pids
                    and "dur" in ev):
                tot[ev.get("name", "?")] += ev["dur"]
                total += ev["dur"]
        log(f"== fused(3,2) chunk: {total/1e3:.2f} ms device "
            f"({rays.shape[0]/(total/1e6)/1e6:.2f} Mrays/s)")
        for k, v in tot.most_common(28):
            log(f"   {v/1e3:8.2f} ms  {k}")

    if which in ("hlo", "both"):
        compiled = jf.lower(params, rays, it, rng).compile()
        txt = compiled.as_text()
        out_path = "/tmp/hw_queue/fused_glue_hlo.txt"
        with open(out_path, "w") as fh:
            fh.write(txt)
        log(f"wrote {len(txt)} bytes -> {out_path}")
        pat = re.compile(
            r"^\s*(?:ROOT )?%?([\w.-]+) = [^\n]*?"
            r"(fusion|while|dynamic-update-slice|copy|reshape|"
            r"concatenate|custom-call|gather|scatter)[^\n]*", re.M)
        meta = re.compile(r'metadata=\{([^}]*)\}')
        for m in pat.finditer(txt):
            line = m.group(0)
            mm = meta.search(line[:4000])
            if mm and m.group(2) in ("fusion", "while",
                                     "dynamic-update-slice", "copy",
                                     "custom-call"):
                info = mm.group(1)
                info = re.sub(r'source_file="[^"]*/', 'file="', info)
                log(f"{m.group(1)[:40]:42s} {info[:240]}")


if __name__ == "__main__":
    main()
