"""Probe 9: Mosaic primitives for the coherent patch-gather shade
branch (ops/patch_gather.py design; one 256-512 B patch row per 4-ray
block).

The phase-decomposed design needs, inside one kernel:
  B2. strided LANE slice  x[:, p::4]   ([16, blk] -> [16, blk/4])
      (strided SUBLANE slices are known-broken — exp_pallas_probe5;
      lanes unproven)
  B3. strided lane STORE  o[:, p::4] = v   (alternative output path)
  B4. jnp.repeat(x, 4, axis=1) elementwise lane repeat (alternative
      expansion path; pltpu.repeat is TILE-concat semantics, verified
      in interpret mode)
  A.  pltpu.repeat tile-concat [C, T/4] -> [C, T] (the phase-tile
      lane-order alternative)
  D.  the full patch blend at P=8 (4x2) texels x C=16 ch via phase
      slices — lowers? rate at flagship scale?

Each probe compiles + runs standalone and prints OK/FAIL + a value
check; the design picks whichever primitive set survives.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def try_probe(name, fn, check=None):
    try:
        out = fn()
        jax.block_until_ready(out)
        msg = f"[{name}] OK, shape {jax.tree.leaves(out)[0].shape}"
        if check is not None:
            msg += f", err {check(np.asarray(out)):.2e}"
        log(msg)
        return True
    except Exception as e:  # noqa: BLE001
        log(f"[{name}] FAIL: {str(e)[:250]}")
        return False


def main():
    log("devices:", jax.devices())
    C, T = 16, 512
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(C, T)).astype(np.float32)
    x = jnp.asarray(x_np)
    xq_np = rng.normal(size=(C, T // 4)).astype(np.float32)
    xq = jnp.asarray(xq_np)

    def k_slice(x_ref, o_ref):
        o_ref[:] = x_ref[:, 1::4]

    try_probe("B2 strided lane slice [C,T]->[C,T/4]",
              lambda: pl.pallas_call(k_slice, out_shape=jax.ShapeDtypeStruct(
                  (C, T // 4), jnp.float32))(x),
              check=lambda o: np.abs(o - x_np[:, 1::4]).max())

    def k_store(x_ref, o_ref):
        o_ref[:] = jnp.zeros((C, T), jnp.float32)
        o_ref[:, 1::4] = x_ref[:]

    try_probe("B3 strided lane store",
              lambda: pl.pallas_call(k_store, out_shape=jax.ShapeDtypeStruct(
                  (C, T), jnp.float32))(xq),
              check=lambda o: np.abs(o[:, 1::4] - xq_np).max())

    def k_erepeat(x_ref, o_ref):
        o_ref[:] = jnp.repeat(x_ref[:], 4, axis=1)

    try_probe("B4 jnp.repeat elementwise lane x4",
              lambda: pl.pallas_call(k_erepeat,
                                     out_shape=jax.ShapeDtypeStruct(
                                         (C, T), jnp.float32))(xq),
              check=lambda o: np.abs(o - np.repeat(xq_np, 4, 1)).max())

    def k_trepeat(x_ref, o_ref):
        o_ref[:] = pltpu.repeat(x_ref[:], 4, axis=1)

    try_probe("A pltpu.repeat tile-concat lane x4",
              lambda: pl.pallas_call(k_trepeat,
                                     out_shape=jax.ShapeDtypeStruct(
                                         (C, T), jnp.float32))(xq),
              check=lambda o: np.abs(o - np.tile(xq_np, (1, 4))).max())

    # ---- D: phase-decomposed patch blend at flagship scale.
    # patch rows [blk/4, P*C] bf16 as gathered; u, v offsets [1, blk]
    # f32 in sample-lane order; out [C, blk] f32 in PHASE-MAJOR order
    # (phase p occupies lanes [p*blk/4, (p+1)*blk/4)).
    PX, PY, PC_C = 4, 2, 16
    P = PX * PY
    blk = 2048

    def k_blend(patch_ref, u_ref, v_ref, o_ref):
        patch = patch_ref[:].astype(jnp.float32).T      # [P*C, blk/4]
        for p in range(4):
            u = u_ref[:, p::4]                          # [1, blk/4]
            v = v_ref[:, p::4]
            acc = jnp.zeros((PC_C, blk // 4), jnp.float32)
            for ty in range(PY):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(v - ty))
                for tx in range(PX):
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(u - tx))
                    t = ty * PX + tx
                    acc = acc + (wx * wy) * patch[t * PC_C:(t + 1) * PC_C]
            o_ref[:, p * (blk // 4):(p + 1) * (blk // 4)] = acc

    N = 1 << 21
    patch = jnp.asarray(
        rng.normal(size=(N // 4, P * PC_C)).astype(np.bfloat16)
        if hasattr(np, "bfloat16") else
        rng.normal(size=(N // 4, P * PC_C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    u = jnp.asarray(rng.uniform(0, 3, size=(1, N)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, size=(1, N)).astype(np.float32))

    def run_blend(patch, u, v):
        return pl.pallas_call(
            k_blend,
            grid=(N // blk,),
            in_specs=[
                pl.BlockSpec((blk // 4, P * PC_C), lambda i: (i, 0)),
                pl.BlockSpec((1, blk), lambda i: (0, i)),
                pl.BlockSpec((1, blk), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((PC_C, blk), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((PC_C, N), jnp.float32),
        )(patch, u, v)

    f = jax.jit(run_blend)
    if try_probe("D phase-decomposed blend 4x2xC16", lambda: f(patch, u, v)):
        variants = [u + 1e-3 * (i + 1) for i in range(6)]
        for vx in variants:
            float(vx[0, 0])
        t0 = time.perf_counter()
        outs = [f(patch, vx, v) for vx in variants]
        float(outs[-1][0, 0])
        dt = (time.perf_counter() - t0) / len(variants)
        log(f"[D] {dt * 1e3:.2f} ms for {N / 1e6:.1f}M samples "
            f"({N / dt / 1e6:.0f} M samples/s)")


if __name__ == "__main__":
    sys.exit(main())
