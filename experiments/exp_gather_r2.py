"""Round-2 gather experiments on the real TPU (v5e via axon tunnel).

Questions this answers (feeds the fused render-core design):
  T1  Mosaic dynamic_gather (take_along_axis in Pallas): supported shapes +
      throughput for VMEM-resident table lookups.
  T2  XLA "two-hot matmul" gather: replace the 1D/time-plane row gather with
      a fused (iota==idx)*w one-hot contracted on the MXU. Does XLA fuse the
      one-hot generation into the dot (no [N, R] materialization), and what
      is the rate vs the row gather?
  T3  In-kernel relayout cost: [blk, 128] u32 -> grouped transpose to
      channels-first (the layout move a fused consumer kernel would pay in
      VMEM instead of XLA's 7.6 ms HBM relayout copies).
  T8  XLA row-gather rate vs table size and index sortedness (is the
      ~557M rows/s floor locality-sensitive?).

Timing: chained computations (each iteration's input depends on the
previous output) inside a jitted lax.scan, one scalar readback; rate from
run-length differencing — the only method that survives the axon tunnel
(PERFORMANCE.md "Timing methodology").
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def time_chain(make_step, init_state, k1=4, k2=20):
    """Time one step of state -> state via scan run-length differencing."""
    def runner(k):
        def body(s, _):
            return make_step(s), None
        f = jax.jit(lambda s: jax.lax.scan(body, s, None, length=k)[0])
        s = f(init_state)  # compile + warm
        s = jax.tree.map(lambda x: x, s)
        # readback forces completion through the tunnel
        leaf = jax.tree.leaves(s)[0]
        float(jnp.sum(leaf[..., :1].astype(jnp.float32)).item()
              if leaf.ndim else leaf)
        t0 = time.perf_counter()
        s2 = f(init_state)
        leaf = jax.tree.leaves(s2)[0]
        float(jnp.sum(leaf[..., :1].astype(jnp.float32)).item()
              if leaf.ndim else leaf)
        return time.perf_counter() - t0
    t1 = runner(k1)
    t2 = runner(k2)
    return (t2 - t1) / (k2 - k1)


# ---------------------------------------------------------------- T8: XLA
def t8_xla_gather(N=1 << 23):
    log("== T8: XLA row-gather rate vs table size / sortedness ==")
    for R, C in [(128, 16), (512, 16), (26244, 16), (1 << 20, 16)]:
        table = jnp.asarray(
            np.random.randint(0, 1 << 30, (R, C), dtype=np.uint32))
        for sortidx in (False, True):
            idx0 = np.random.randint(0, R, N).astype(np.int32)
            if sortidx:
                idx0 = np.sort(idx0)
            idx0 = jnp.asarray(idx0)

            def step(state, table=table, R=R):
                idx, salt = state
                rows = table[idx]                     # [N, C] gather
                fold = rows[:, 0]
                for c in range(1, rows.shape[1]):
                    fold = fold ^ rows[:, c]
                # next indices depend on every gathered byte (defeats
                # narrowing); stays in-range
                idx2 = ((idx + (fold & 0x7).astype(jnp.int32) * 0
                         + salt) % R + (fold % 2).astype(jnp.int32) * 0)
                return (idx2, salt + 1)

            dt = time_chain(step, (idx0, jnp.int32(1)))
            log(f"  R={R:>8} C={C} sorted={int(sortidx)}: "
                f"{dt*1e3:8.2f} ms -> {N/dt/1e6:8.1f} M rows/s")


# ---------------------------------------------------------------- T2: XLA
def t2_xla_twohot(N=1 << 23):
    log("== T2: XLA two-hot matmul vs 1D row gather ==")
    from hyperreel_tpu.ops.grid_sample import grid_sample_1d_cf_quad

    for R, C in [(128, 16), (512, 16), (2048, 16)]:
        line = jnp.asarray(np.random.randn(R, C).astype(np.float32))
        line_bf = line.astype(jnp.bfloat16)
        z0 = jnp.asarray(np.random.uniform(-1, 1, N).astype(np.float32))

        def step_mm(state, line_bf=line_bf, R=R):
            z, salt = state
            zz = (z * 0.5 + 0.5) * (R - 1)
            zi = jnp.floor(zz)
            w1 = zz - zi
            zi = zi.astype(jnp.int32)
            iota = jax.lax.broadcasted_iota(jnp.int32, (N, R), 1)
            A = (jnp.where(iota == zi[:, None], 1.0 - w1[:, None], 0.0)
                 + jnp.where(iota == zi[:, None] + 1, w1[:, None], 0.0)
                 ).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                A, line_bf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [N, C]
            z2 = jnp.tanh(z + out[:, 0] * 1e-6) + salt * 0.0
            return (z2, salt + 1)

        def step_gather(state, line=line.astype(jnp.bfloat16)):
            z, salt = state
            out = grid_sample_1d_cf_quad(line, z)       # [C/2, N, 2]
            z2 = jnp.tanh(z + out[0, :, 0] * 1e-6) + salt * 0.0
            return (z2, salt + 1)

        dt_mm = time_chain(step_mm, (z0, jnp.float32(0)))
        dt_g = time_chain(step_gather, (z0, jnp.float32(0)))
        log(f"  R={R:>5} C={C}: two-hot matmul {dt_mm*1e3:8.2f} ms "
            f"({N/dt_mm/1e6:7.1f} M/s)  quad-gather {dt_g*1e3:8.2f} ms "
            f"({N/dt_g/1e6:7.1f} M/s)")


# ------------------------------------------------------------- T1: Pallas
def t1_pallas_dynamic_gather(total=1 << 23):
    log("== T1: Pallas dynamic_gather (take_along_axis) ==")

    for A, B in [(8, 128), (128, 128), (128, 512), (512, 128), (1024, 128),
                 (128, 1024)]:
        try:
            def kernel(tab_ref, idx_ref, out_ref):
                out_ref[:] = jnp.take_along_axis(
                    tab_ref[:], idx_ref[:], axis=0)

            blk = A * B
            nblk = max(total // blk, 1)
            tab = jnp.asarray(
                np.random.randn(nblk * A, B).astype(np.float32))
            idx0 = jnp.asarray(
                np.random.randint(0, A, (nblk * A, B)).astype(np.int32))

            f = pl.pallas_call(
                kernel,
                grid=(nblk,),
                in_specs=[
                    pl.BlockSpec((A, B), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((A, B), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((A, B), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nblk * A, B), jnp.float32),
            )

            def step(state, A=A):
                idx, salt = state
                out = f(tab, idx)
                idx2 = (idx + out.astype(jnp.int32) + salt) % A
                return (idx2, salt + 1)

            # correctness probe (tiny)
            out = f(tab, idx0)
            want = np.take_along_axis(np.asarray(tab[:A]),
                                      np.asarray(idx0[:A]), axis=0)
            ok = np.allclose(np.asarray(out[:A]), want)
            dt = time_chain(step, (idx0, jnp.int32(1)))
            n = nblk * A * B
            log(f"  A={A:>5} B={B:>5}: ok={ok} {dt*1e3:8.2f} ms "
                f"-> {n/dt/1e6:8.1f} M lookups/s")
        except Exception as e:
            log(f"  A={A:>5} B={B:>5}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")


# ------------------------------------------------------------- T3: Pallas
def t3_pallas_relayout(total=1 << 23):
    log("== T3: in-kernel grouped relayout [blk,128]u32 -> [C,blk*8] ==")
    # rows packed 8 samples per sublane-row (sample n=8i+j at lanes
    # 16j..16j+15). Kernel must produce channels-first [16, 8*blk].
    blk = 4096
    nblk = total // (blk * 8)
    rows = jnp.asarray(
        np.random.randint(0, 1 << 30, (nblk * blk, 128), dtype=np.uint32)
    ).view(jnp.float32)

    def kernel(in_ref, out_ref):
        x = in_ref[:]                                  # [blk, 128] f32
        x = x.reshape(blk, 8, 16)
        x = jnp.transpose(x, (2, 0, 1))                # [16, blk, 8]
        out_ref[:] = x.reshape(16, blk * 8)

    try:
        f = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((16, blk * 8), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, nblk * blk * 8),
                                           jnp.float32),
        )

        def step(state):
            x, salt = state
            out = f(x)
            x2 = x + out[0, 0] * 1e-9 + salt * 0.0
            return (x2, salt + 1.0)

        out = f(rows)
        want = np.asarray(rows[:blk]).reshape(blk, 8, 16).transpose(
            2, 0, 1).reshape(16, blk * 8)
        ok = np.allclose(np.asarray(out[:, :blk * 8]), want)
        dt = time_chain(step, (rows, jnp.float32(0)))
        n = nblk * blk * 8
        log(f"  ok={ok} {dt*1e3:8.2f} ms for {n/1e6:.1f}M samples x 16ch "
            f"-> {n/dt/1e6:8.1f} M samples/s")
    except Exception as e:
        log(f"  FAILED {type(e).__name__}: {str(e)[:300]}")


# ------------------------------------------------------------- T5: Pallas
def t5_pallas_twohot(total=1 << 23):
    log("== T5: Pallas two-hot matmul time-lookup kernel ==")
    for R, C in [(128, 16), (512, 16)]:
        B = 8192
        nblk = total // B
        line = jnp.asarray(np.random.randn(R, C).astype(np.float32))
        z0 = jnp.asarray(
            np.random.uniform(0, R - 1.001, (nblk * B, 1)).astype(
                np.float32))

        def kernel(z_ref, line_ref, out_ref, *, R=R, B=B):
            z = z_ref[:, 0]                            # [B]
            zi = jnp.floor(z)
            w1 = z - zi
            zi = zi.astype(jnp.int32)
            iota = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
            A = (jnp.where(iota == zi[:, None], 1.0 - w1[:, None], 0.0)
                 + jnp.where(iota == zi[:, None] + 1, w1[:, None], 0.0)
                 ).astype(jnp.bfloat16)
            out_ref[:] = jax.lax.dot_general(
                A, line_ref[:].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        try:
            f = pl.pallas_call(
                kernel,
                grid=(nblk,),
                in_specs=[
                    pl.BlockSpec((B, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((R, C), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, C), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nblk * B, C), jnp.float32),
            )

            out = f(z0, line)
            zz = np.asarray(z0[:4, 0])
            zi = np.floor(zz).astype(int)
            w1 = zz - zi
            want = (np.asarray(line)[zi] * (1 - w1)[:, None]
                    + np.asarray(line)[zi + 1] * w1[:, None])
            ok = np.allclose(np.asarray(out[:4]), want, atol=2e-2)

            def step(state, R=R):
                z, salt = state
                out = f(z, line)
                z2 = jnp.clip(z + out[:, :1] * 1e-7 + salt * 0.0,
                              0, R - 1.001)
                return (z2, salt + 1.0)

            dt = time_chain(step, (z0, jnp.float32(0)))
            n = nblk * B
            log(f"  R={R:>5} C={C}: ok={ok} {dt*1e3:8.2f} ms "
                f"-> {n/dt/1e6:8.1f} M lookups/s")
        except Exception as e:
            log(f"  R={R:>5} C={C}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")


ALL = {
    "t8": t8_xla_gather,
    "t2": t2_xla_twohot,
    "t1": t1_pallas_dynamic_gather,
    "t3": t3_pallas_relayout,
    "t5": t5_pallas_twohot,
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    names = args.only.split(",") if args.only else list(ALL)
    log("devices:", jax.devices())
    for name in names:
        try:
            ALL[name.strip()]()
        except Exception as e:
            log(f"{name} CRASHED: {type(e).__name__}: {e}")
    log("DONE")
