"""Probe 9: XLA row-gather rate vs ROW WIDTH (128 B .. 4 KB), v5e.

Feeds the coherence/patch-table design decision: the flagship eval's
14.5 ms space-quad gather runs at the ~557M rows/s per-row floor with
128 B rows (~71 GB/s — far under the ~819 GB/s HBM peak). If WIDER rows
deliver materially more GB/s, a patch table (one row = a 4x4-texel
neighborhood serving a whole 2x2 ray block) turns 4 row-gathers into 1
wide-row gather and beats the floor. If GB/s is flat, the line closes.

Methodology (the only tunnel-trustworthy one, exp_gather_r2.py): a
chained lax.scan where the NEXT indices depend on every gathered lane
(defeats XLA's gather rewrites and dead-lane narrowing), run-length
differencing between scan lengths, one scalar readback.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def time_chain(make_step, init_state, k1=4, k2=20):
    def runner(k):
        def body(s, _):
            return make_step(s), None
        f = jax.jit(lambda s: jax.lax.scan(body, s, None, length=k)[0])
        s = f(init_state)
        leaf = jax.tree.leaves(s)[0]
        float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
        t0 = time.perf_counter()
        s2 = f(init_state)
        leaf = jax.tree.leaves(s2)[0]
        float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
        return time.perf_counter() - t0
    t1 = runner(k1)
    t2 = runner(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    log("devices:", jax.devices())
    R = 66049                      # ~257^2 anchors (flagship-table scale)
    N = 1 << 21                    # 2M gathered rows per step
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, R, N).astype(np.int32))

    # C u32 lanes per row: 32 -> 128 B (the current quad row), up to
    # 1024 -> 4 KB (a 4x4-texel bf16 patch at C=16 is 512 B; 8x8 = 2 KB)
    for C in (32, 64, 128, 256, 512, 1024):
        table = jnp.asarray(
            rng.integers(0, 1 << 30, (R, C)).astype(np.uint32))

        def step(state, table=table):
            idx, acc = state
            rows = table[idx]                    # [N, C] row gather
            # fold EVERY lane so none is dead; keep it cheap (xor tree)
            half = rows.shape[1]
            while half > 1:
                half //= 2
                rows = rows[:, :half] ^ rows[:, half:2 * half]
            fold = rows[:, 0]
            idx2 = ((idx + (fold & 0x7).astype(jnp.int32)) % R)
            return idx2, acc + fold[:1].astype(jnp.float32)

        dt = time_chain(step, (idx0, jnp.zeros(1, jnp.float32)))
        bytes_row = C * 4
        gbs = N * bytes_row / dt / 1e9
        log(f"C={C:5d} ({bytes_row:5d} B/row): {dt * 1e3:7.2f} ms "
            f"-> {N / dt / 1e6:7.1f} M rows/s, {gbs:7.1f} GB/s")


if __name__ == "__main__":
    sys.exit(main())
