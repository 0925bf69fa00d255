"""Shade-kernel ablation breakdown #2: the CURRENT flagship route.

Round-5 fused_glue trace: the fused blend+shade kernel (fn.3) is 5.14
ms of the 15.2 ms chunk — the single largest term now that the gather
is R=8-halved. Which stage? Run _shade_kernel_fused_patch in isolation
at the exact bench dims (R=8, (5,2) patch, premixed TH=0) with stages
ablated and difference the timings.

Stages (independent ablations, shade.py `ablate`):
  full    control
  blend   skip the 10-texel hat-FMA patch blend (one texel slice)
  time    skip the whole time-plane lookup (feat_t = feat_s)
  amm     keep weights, skip the z two-hot strip+MXU matmul
  sh      skip SH shading (rgb = raw app rows)
  comp    skip the segmented transmittance scan (w = alpha)
  outmm   skip the per-ray compaction matmul (raw row write)
  outmm1  single-pass compaction (bf16 hi only)

Flagship dims (spy on fused_shade_composite at the bench entry):
S=32, tile=128 (blk=4096), C=16 (nd=8), premixed ttab [16, 128]
(TW=80), n_basis=9 (SH deg 2), W=H=161, R=8, patch (5,2).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


S = 32
TILE = 128
BLK = TILE * S
NRAYS = 1 << 18
N = NRAYS * S
C = 16
ND = 8
TW = 80
RT = 128
NB = 9
W = H = 161
R = 8
PX, PY = 5, 2


def main():
    from hyperreel_tpu.ops.pallas.shade import fused_shade_composite

    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(N // R, PX * PY * C)).astype(
        np.float32)).astype(jnp.bfloat16)
    anchors = jnp.asarray(
        rng.uniform(0, W - PX, size=(2, N // R)).astype(np.float32))
    pack = np.zeros((16, N), np.float32)
    pack[0:3] = rng.uniform(-0.95, 0.95, size=(3, N))
    pack[3] = rng.uniform(-0.9, 0.9, size=N)
    pack[4] = np.sort(rng.uniform(0.1, 4.0, size=N))
    pack[5:14] = rng.normal(size=(9, N)).astype(np.float32) * 0.1
    pack = jnp.asarray(pack)
    ttab = jnp.asarray(rng.normal(size=(C, RT)).astype(np.float32))
    wb = np.zeros((3 * NB, C), np.float32)
    wb[:, ND:] = rng.normal(size=(3 * NB, C - ND)) * 0.3
    wb = jnp.asarray(wb)

    def make(ablate):
        def fn(rows, pack, ttab, wb):
            return fused_shade_composite(
                rows, pack, ttab, wb, S=S, W=W, H=H, TW=TW, TH=0,
                n_density=ND, n_basis=NB, shading="sh",
                density_shift=0.0, distance_scale=1.0, tile=TILE,
                s_major=True, preblended="fused_patch",
                anchors=anchors, patch_pxy=(PX, PY), m0=0, m1=1,
                patch_block=R, ablate=ablate)
        return jax.jit(fn)

    def timeit(f, tag):
        # DEVICE trace, not wall: standalone dispatch wall through the
        # tunnel is dominated by input streaming + round-trip latency
        # (leg-4 first run: "full" 151.9 ms artifact vs ~9 ms legs, all
        # ablation deltas buried in tunnel variance). Sum the X events
        # of the pallas kernel only.
        import collections
        import glob
        import gzip
        import json
        out = f(rows, pack, ttab, wb)
        jax.block_until_ready(out)
        v1 = rows.at[0, 0].add(jnp.bfloat16(1e-3))
        v2 = rows.at[0, 1].add(jnp.bfloat16(2e-3))
        jax.block_until_ready(f(v1, pack, ttab, wb))
        d = f"/tmp/shade_bd2_{tag}"
        with jax.profiler.trace(d):
            jax.block_until_ready(f(v2, pack, ttab, wb))
        files = sorted(glob.glob(f"{d}/**/*.trace.json.gz",
                                 recursive=True))
        with gzip.open(files[-1], "rt") as fh:
            tr = json.load(fh)
        pid_names = {}
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        dev_pids = {p for p, nm in pid_names.items()
                    if "TPU" in nm or "/device" in nm.lower()
                    or "XLA" in nm}
        tot = collections.Counter()
        for ev in tr.get("traceEvents", []):
            if (ev.get("ph") == "X" and ev.get("pid") in dev_pids
                    and "dur" in ev):
                tot[ev.get("name", "?")] += ev["dur"]
        # the pallas kernel is the dominant single op; report it and
        # the device total
        top = tot.most_common(3)
        kern = max(tot.values()) / 1e3 if tot else 0.0
        log(f"    [{tag}] top ops: "
            + "; ".join(f"{k}={v/1e3:.2f}ms" for k, v in top))
        return kern

    base = None
    for ab in ["full", "blend", "amm", "time", "sh", "comp",
               "outmm1"]:
        ablate = () if ab == "full" else (ab,)
        try:
            dt = timeit(make(ablate), ab)
        except Exception as e:  # noqa: BLE001 - per-leg survival
            log(f"{ab:8s} FAILS: {type(e).__name__}: {str(e)[:200]}")
            continue
        if ab == "full":
            base = dt
            log(f"{ab:8s} {dt:7.2f} ms/chunk")
        else:
            log(f"{ab:8s} {dt:7.2f} ms/chunk  (saves {base - dt:+.2f})")
    log("ALL OK")


if __name__ == "__main__":
    main()
