"""Round-5 probe: patch-row gather rate vs ALIGNMENT at the shipped
widths. The (3,2) patch row is 192 B (48 u32) — off the 128 B tile
grid — and the round-4 real-frame trace measured 384 B rows at ~0.55x
the 128 B per-row rate (worse than the microbench's 0.85x). Does
PADDING the row stride to the next 128 B multiple (48 -> 64 u32,
96 -> 128 u32) recover per-row rate despite +33% bytes? If yes, the
patch table layout flips to padded strides and the headline gather
floor drops ~free.

Width legend: 32 u32 = 128 B quad row; 48 = (3,2) patch row; 64 =
(3,2) PADDED; 96 = (4,3) patch row; 128 = (4,3) PADDED.
Index streams: random AND coherent (sorted — the scanline frame case).
"""

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "experiments")
from exp_gather_width import log, time_chain  # noqa: E402
import jax  # noqa: E402


def main():
    log("devices:", jax.devices())
    R = 66049
    N = 1 << 19
    rng = np.random.default_rng(0)
    base = rng.integers(0, R, N).astype(np.int32)
    streams = {"rand": base, "coher": np.sort(base)}

    for C in (32, 48, 64, 96, 128):
        table = jnp.asarray(
            rng.integers(0, 1 << 30, (R, C)).astype(np.uint32))
        for sname, idx_h in streams.items():
            idx0 = jnp.asarray(idx_h)

            def step(state, table=table):
                idx, acc = state
                rows = table[idx]
                # xor-fold every lane (no dead lanes); odd widths fold
                # with a split at floor half
                w = rows.shape[1]
                while w > 1:
                    h = w // 2
                    rows = rows[:, :h] ^ rows[:, w - h:w]
                    w = h
                fold = rows[:, 0]
                idx2 = ((idx + (fold & 0x7).astype(jnp.int32)) % R)
                return idx2, acc + fold[:1].astype(jnp.float32)

            dt = time_chain(step, (idx0, jnp.zeros(1, jnp.float32)),
                            k1=4, k2=16)
            log(f"C={C:4d} ({C*4:4d} B/row) {sname:5s}: {dt*1e3:7.2f} ms"
                f" -> {N/dt/1e6:7.1f} M rows/s, {N*C*4/dt/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
