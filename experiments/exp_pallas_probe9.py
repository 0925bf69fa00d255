"""Probe 9b: Mosaic primitives needed by the coherent patch-gather
design (one 512 B patch row serving a 4-ray block):

  A. pltpu.repeat(x, 4, axis=1) lane-expand [C, T/4] -> [C, T]
  B. jnp.repeat lane-expand (same shape goal)
  C. lane roll (pltpu.roll axis=1) — group-min alternative
  D. in-kernel patch blend at P=16 texels x C=16 ch from an expanded
     patch block + iota-compare weights (the full per-sample cost the
     shade kernel would pay) — lowers? rough rate?

Each probe compiles + runs standalone; failures print the Mosaic error
and continue (the design needs A-or-B AND D).
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def try_probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        log(f"[{name}] OK, out shape {jax.tree.leaves(out)[0].shape}")
        return True
    except Exception as e:  # noqa: BLE001
        log(f"[{name}] FAIL: {str(e)[:300]}")
        return False


def main():
    log("devices:", jax.devices())
    C, T = 64, 512

    x_small = jnp.asarray(
        np.random.default_rng(0).normal(size=(C, T // 4)).astype(np.float32))

    def kernel_repeat_pltpu(x_ref, o_ref):
        o_ref[:] = pltpu.repeat(x_ref[:], 4, axis=1)

    def kernel_repeat_jnp(x_ref, o_ref):
        o_ref[:] = jnp.repeat(x_ref[:], 4, axis=1)

    def kernel_lane_roll(x_ref, o_ref):
        o_ref[:] = jnp.minimum(x_ref[:], pltpu.roll(x_ref[:], 1, 1))

    for name, kern, oshape in [
            ("A pltpu.repeat lane x4", kernel_repeat_pltpu, (C, T)),
            ("B jnp.repeat lane x4", kernel_repeat_jnp, (C, T)),
            ("C lane roll", kernel_lane_roll, (C, T // 4)),
    ]:
        try_probe(name, lambda kern=kern, oshape=oshape: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        )(x_small))

    # D: the full patch blend. patch block [blk/4, P*C] bf16 (as gathered),
    # offset rows ox, oy in [0, 3) f32 [1, blk]; out [C, blk] f32.
    P_SIDE, PC_C = 4, 16
    P = P_SIDE * P_SIDE
    blk = 512

    def kernel_patch_blend(patch_ref, ox_ref, oy_ref, o_ref):
        patch = patch_ref[:].astype(jnp.float32).T      # [P*C, blk/4]
        patch = pltpu.repeat(patch, 4, axis=1)          # [P*C, blk]
        ox, oy = ox_ref[:], oy_ref[:]                   # [1, blk]
        acc = jnp.zeros((PC_C, blk), jnp.float32)
        for ty in range(P_SIDE):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(oy - ty))
            for tx in range(P_SIDE):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(ox - tx))
                t = ty * P_SIDE + tx
                acc = acc + (wx * wy) * patch[t * PC_C:(t + 1) * PC_C]
        o_ref[:] = acc

    N = 1 << 21                                         # samples
    rng = np.random.default_rng(1)
    patch = jnp.asarray(
        rng.normal(size=(N // 4, P * PC_C)).astype(jnp.bfloat16))
    ox = jnp.asarray(rng.uniform(0, 3, size=(1, N)).astype(np.float32))
    oy = jnp.asarray(rng.uniform(0, 3, size=(1, N)).astype(np.float32))

    def run_blend(patch, ox, oy):
        grid = N // blk
        return pl.pallas_call(
            kernel_patch_blend,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((blk // 4, P * PC_C), lambda i: (i, 0)),
                pl.BlockSpec((1, blk), lambda i: (0, i)),
                pl.BlockSpec((1, blk), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((PC_C, blk), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((PC_C, N), jnp.float32),
        )(patch, ox, oy)

    f = jax.jit(run_blend)
    if try_probe("D patch blend 16x16", lambda: f(patch, ox, oy)):
        variants = [(patch, ox + 1e-3 * (i + 1), oy) for i in range(6)]
        for _, vx, _ in variants:
            float(vx[0, 0])
        t0 = time.perf_counter()
        outs = [f(patch, vx, vy) for patch, vx, vy in variants]
        float(outs[-1][0, 0])
        dt = (time.perf_counter() - t0) / len(variants)
        log(f"[D] {dt * 1e3:.2f} ms for {N / 1e6:.1f}M samples "
            f"({N / dt / 1e6:.0f} M samples/s)")


if __name__ == "__main__":
    sys.exit(main())
