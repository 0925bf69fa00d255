"""Probe 4: ops for the channels-first fused kernel — in-kernel
transpose of the rows block, lane-axis repeat, segmented lane scan."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def probe(name, fn, want=None, atol=1e-5):
    try:
        t0 = time.perf_counter()
        out = fn()
        out.block_until_ready()
        extra = ""
        if want is not None:
            err = np.abs(np.asarray(out) - want).max()
            extra = f" maxerr={err:.2e} {'PASS' if err <= atol else 'FAIL'}"
        log(f"OK   {name} ({time.perf_counter()-t0:.1f}s){extra}")
        return True
    except Exception as e:
        log(f"FAIL {name}: {type(e).__name__}: {str(e)[:140]}")
        return False


def main():
    log("devices:", jax.devices())
    blk, C4 = 2048, 64
    S = 32

    x = np.random.randn(blk, C4).astype(np.float32)
    xj = jnp.asarray(x, jnp.bfloat16)

    # T1: bf16 [blk, 64] -> f32 transpose [64, blk]
    def k1(i_ref, o_ref):
        o_ref[:] = i_ref[:].astype(jnp.float32).T
    probe("bf16 rows transpose (2048,64)->(64,2048)",
          lambda: pl.pallas_call(
              k1, out_shape=jax.ShapeDtypeStruct((C4, blk), jnp.float32),
              in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
              out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(xj),
          want=np.asarray(xj.astype(jnp.float32)).T, atol=0)

    # T2: jnp.repeat along lanes
    y = np.random.randn(9, 64).astype(np.float32)

    def k2(i_ref, o_ref):
        o_ref[:] = jnp.repeat(i_ref[:], S, axis=1)
    probe("jnp.repeat axis=1 [9,64]->[9,2048]", lambda: pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((9, blk), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(y)),
        want=np.repeat(y, S, axis=1), atol=0)

    # T3: segmented lane scan (masked shift-adds), segment length S
    v = np.random.randn(1, blk).astype(np.float32)

    def k3(i_ref, o_ref):
        acc = i_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        shift = 1
        while shift < S:
            sh = jnp.concatenate(
                [jnp.zeros_like(acc[:, :shift]), acc[:, :-shift]], 1)
            acc = acc + jnp.where(lane % S >= shift, sh, 0.0)
            shift *= 2
        o_ref[:] = acc
    want = v.reshape(-1, S).cumsum(1).reshape(1, blk)
    probe("segmented lane cumsum S=32", lambda: pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((1, blk), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(v)),
        want=want, atol=1e-4)

    # T4: (1, blk) block spec over [nblk, blk] input with index (i, 0)
    nblk = 4
    z = np.random.randn(nblk, blk).astype(np.float32)

    def k4(i_ref, o_ref):
        o_ref[:] = i_ref[:] * 2.0
    probe("(1, blk) row blocks over [nblk, blk]", lambda: pl.pallas_call(
        k4, grid=(nblk,),
        in_specs=[pl.BlockSpec((1, blk), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, blk), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, blk), jnp.float32))(
            jnp.asarray(z)),
        want=z * 2, atol=0)

    # T5: matmul-based per-ray->per-sample lane broadcast
    def k5(i_ref, o_ref):
        tile = 64
        sub = jax.lax.broadcasted_iota(jnp.int32, (tile, blk), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, blk), 1)
        expand = jnp.where(sub == lane // S, 1.0, 0.0)
        o_ref[:] = jax.lax.dot_general(
            i_ref[:].astype(jnp.bfloat16), expand.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    probe("expand matmul [9,64]@[64,2048]", lambda: pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((9, blk), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(y)),
        want=np.repeat(y, S, axis=1), atol=5e-2)

    log("DONE")


if __name__ == "__main__":
    main()
