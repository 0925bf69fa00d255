"""Shade-kernel ablation breakdown on HW at the bench chunk shape.

The dynamic shade kernel is 6.4 ms of the 27.1 ms eval chunk
(PERFORMANCE.md round-3b trace). Which stage? Run the kernel in
isolation at flagship dims with stages ablated and difference the
timings.

Stages (cumulative independent ablations):
  full        control
  gatherread  skip reading+transposing+blending the gathered quad rows
  blend       read+transpose but skip the 4-corner FMA blend
  time        skip the whole time-plane lookup
  amm         time lookup but skip the z two-hot MXU matmul
  tmix        ... skip the keyframe mixing loop only
  sh          skip SH shading (rgb = raw app rows)
  comp        skip the segmented transmittance scan (w = alpha)
  outmm       skip the per-ray compaction matmul (raw row write)
  outmm1      single-pass (bf16-rounded) compaction matmul

Flagship dims: S=32 k kept, tile=128 (blk=4096), C=16 (8 sigma + 8
app), TH+2 keyframe rows, Rt=128 padded z width, SH deg 2 (n_basis=9).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


S = 32
TILE = 128
BLK = TILE * S
NRAYS = 1 << 18
N = NRAYS * S
C = 16
ND = 8
TH = 4
TW = 126
RT = 128
NB = 9
W = Hh = 167


def main():
    from hyperreel_tpu.ops.pallas.shade import fused_shade_composite

    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(
        size=(N, 4 * C)).astype(np.float32)).astype(jnp.bfloat16)
    pack = np.zeros((16, N), np.float32)
    pack[0:3] = rng.uniform(-0.95, 0.95, size=(3, N))
    pack[3] = rng.uniform(-0.9, 0.9, size=N)
    pack[4] = np.sort(rng.uniform(0.1, 4.0, size=N))
    pack[5:11] = rng.normal(size=(6, N)) * 0.1
    vd = rng.normal(size=(3, N))
    pack[11:14] = vd / np.linalg.norm(vd, axis=0, keepdims=True)
    pack = jnp.asarray(pack)
    ttab = jnp.asarray(rng.normal(
        size=((TH + 2) * C, RT)).astype(np.float32))
    wb = jnp.asarray(rng.normal(size=(3 * NB, C)).astype(np.float32))

    def make(ablate):
        @jax.jit
        def f(rows, pack, ttab, wb):
            return fused_shade_composite(
                rows, pack, ttab, wb, S=S, W=W, H=Hh, TW=TW, TH=TH,
                n_density=ND, n_basis=NB, density_shift=-10.0,
                distance_scale=25.0, tile=TILE, s_major=True,
                ablate=ablate)
        return f

    def timeit(f, n=6):
        out = f(rows, pack, ttab, wb)
        # VALUE readback, not block_until_ready: through the axon tunnel
        # block_until_ready resolves early, so a pending compile would
        # leak into the timed region (first run of this script did)
        float(out[0, 0])
        packs = [pack.at[0, 0].add(1e-6 * (i + 1)) for i in range(n)]
        for p in packs:
            float(p[0, 0])
        t0 = time.perf_counter()
        outs = [f(rows, p, ttab, wb) for p in packs]
        np.asarray(outs[-1][0, :1])
        return (time.perf_counter() - t0) / n

    results = {}
    # REVERSED order (second run): the first run measured full=72 ms
    # first-in-order with every single-stage ablation ~16 ms — if the
    # first-measured variant is inflated here too, it's a first-variant
    # artifact, and the true isolated kernel cost is ~16 ms.
    results["full"] = float("nan")
    for ab in ("outmm1", "outmm", "comp", "sh", "tmix",
               "time", "blend", "gatherread", "full"):
        ablate = () if ab == "full" else (ab,)
        try:
            dt = timeit(make(ablate))
            results[ab] = dt
            log(f"{ab:12s} {dt*1e3:7.2f} ms"
                + ("" if ab == "full" else
                   f"   (delta vs full {((results['full']-dt)*1e3):+6.2f})"))
        except Exception as e:
            log(f"{ab:12s} FAILS -> {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    sys.exit(main())
