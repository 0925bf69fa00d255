"""Probe 7: can ANY Pallas in-kernel gather beat XLA's ~557M rows/s
per-row floor (jax 0.9.0 / Mosaic, v5e)?

Context: the flagship eval chunk spends 14.5 ms in the XLA space-quad
gather (8.4M rows, ~557M rows/s, PERFORMANCE.md). XLA gather
MICRObenchmarks are untrustworthy (gather+reduce gets rewritten), so no
control here — the in-model floor is the yardstick. These probes ask
whether Mosaic gives any primitive that could move the gather in-kernel
at >= 1G rows/s (worth integrating) or not (close the line).

  B. In-kernel jnp.take(table, idx, axis=0), whole table VMEM-resident.
  C. In-kernel fori_loop of per-row dynamic slices.
  D. In-kernel one-hot matmul gather (small 4K-row table) on the MXU.

Timing: chained distinct idx inputs + final readback (tunnel rules).
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


TROWS = 16900          # ~flagship quad table rows
C = 64                 # f32 lanes per row (256 B)
TILE = 4096            # rows gathered per grid block
GBLK = 8               # idx sublanes per grid step
NROWS = 1 << 21        # 2M rows (enough to time; floor predicts 3.8 ms)


def timeit(fn, idx_np, table, n=6):
    """Distinct idx buffers per call (values perturbed, same distrib)."""
    variants = []
    for i in range(n):
        v = idx_np.copy()
        v[0] = (v[0] + i + 1) % TROWS
        variants.append(jnp.asarray(v))
    out = fn(variants[0], table)
    jax.block_until_ready(out)
    for v in variants:
        jax.block_until_ready(v)
    t0 = time.perf_counter()
    outs = [fn(v, table) for v in variants]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0][:1])
    return (time.perf_counter() - t0) / n


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(TROWS, C)).astype(np.float32))
    idx_np = rng.integers(0, TROWS, size=(NROWS,)).astype(np.int32)

    # ---- B: in-kernel jnp.take, GBLK*TILE rows per grid step
    def take_kernel(idx_ref, tab_ref, out_ref):
        acc = jnp.zeros((GBLK, C), jnp.float32)
        for r in range(GBLK):
            rows = jnp.take(tab_ref[:], idx_ref[r], axis=0)  # [TILE, C]
            acc = acc.at[r].set(rows.sum(0))
        out_ref[:] = acc

    @jax.jit
    def pl_take(idx, table):
        return pl.pallas_call(
            take_kernel,
            grid=(NROWS // (GBLK * TILE),),
            in_specs=[
                pl.BlockSpec((GBLK, TILE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TROWS, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((GBLK, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GBLK, C), jnp.float32),
        )(idx.reshape(-1, TILE), table)

    try:
        dt = timeit(pl_take, idx_np, table)
        log(f"B pl jnp.take:     {dt*1e3:8.2f} ms  "
            f"{NROWS/dt/1e6:7.1f} M rows/s")
    except Exception as e:
        log(f"B pl jnp.take: FAILS -> {type(e).__name__}: "
            f"{str(e)[:300]}")

    # ---- C: per-row dynamic-slice loop (idx via SMEM scalars)
    def loop_kernel(idx_ref, tab_ref, out_ref):
        def body(i, acc):
            return acc + tab_ref[pl.ds(idx_ref[0, i], 1), :]
        acc = jax.lax.fori_loop(
            0, TILE, body, jnp.zeros((1, C), jnp.float32))
        out_ref[:] = acc

    @jax.jit
    def pl_loop(idx, table):
        return pl.pallas_call(
            loop_kernel,
            grid=(NROWS // TILE,),
            in_specs=[
                pl.BlockSpec((1, TILE), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TROWS, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
        )(idx.reshape(-1, TILE), table)

    try:
        dt = timeit(pl_loop, idx_np, table)
        log(f"C pl ds loop:      {dt*1e3:8.2f} ms  "
            f"{NROWS/dt/1e6:7.1f} M rows/s")
    except Exception as e:
        log(f"C pl ds loop: FAILS -> {type(e).__name__}: "
            f"{str(e)[:300]}")

    # ---- D: one-hot matmul on a small table (DTILE lanes per pass)
    SMALLT = 4096
    DTILE = 512
    DROWS = 1 << 20
    idx_d = rng.integers(0, SMALLT, size=(DROWS,)).astype(np.int32)
    table_s = table[:SMALLT].astype(jnp.bfloat16)

    def onehot_kernel(idx_ref, tab_ref, out_ref):
        acc = jnp.zeros((C, DTILE), jnp.float32)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (SMALLT, DTILE), 0)
        for r in range(8):
            ids = idx_ref[r:r + 1]                         # [1, DTILE]
            oh = (iota == ids).astype(jnp.bfloat16)        # [SMALLT, DT]
            acc = acc + jax.lax.dot_general(
                tab_ref[:].astype(jnp.bfloat16), oh,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [C, DTILE]
        out_ref[:] = acc

    @jax.jit
    def pl_onehot(idx, table_s):
        return pl.pallas_call(
            onehot_kernel,
            grid=(DROWS // (8 * DTILE),),
            in_specs=[
                pl.BlockSpec((8, DTILE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SMALLT, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((C, DTILE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, DTILE), jnp.float32),
        )(idx.reshape(-1, DTILE), table_s)

    try:
        dt = timeit(pl_onehot, idx_d, table_s)
        rps = DROWS / dt
        log(f"D onehot mm (4K-row table): {dt*1e3:8.2f} ms  "
            f"{rps/1e6:7.1f} M rows/s  "
            f"(extrapolate 8.4M rows: {(1 << 23)/rps*1e3:.1f} ms)")
    except Exception as e:
        log(f"D onehot mm: FAILS -> {type(e).__name__}: "
            f"{str(e)[:300]}")


if __name__ == "__main__":
    sys.exit(main())
