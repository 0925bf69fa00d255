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

    def timeit(f):
        out = f(rows, pack, ttab, wb)
        jax.block_until_ready(out)
        reps = 6
        variants = [rows.at[0, 0].add(jnp.bfloat16(1e-3 * (i + 1)))
                    for i in range(reps)]
        for v in variants:
            float(v[0, 0])
        t0 = time.perf_counter()
        outs = [f(v, pack, ttab, wb) for v in variants]
        float(outs[-1][0, 0])
        return (time.perf_counter() - t0) / reps * 1e3

    base = None
    for ab in ["full", "blend", "amm", "time", "sh", "comp",
               "outmm1", "outmm"]:
        ablate = () if ab == "full" else (ab,)
        try:
            dt = timeit(make(ablate))
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
