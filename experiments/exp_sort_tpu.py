"""A/B sort-network formulations at the flagship shape [262144, 32] f32
on the real TPU: (a) shipped reshape-based bitonic passes, (b) wide-lane
bitonic — view [B, 32] as [B/4, 128] (row-major, free) so every pass is
full-lane roll + select with no reshapes, partners never crossing the
32-lane group boundary. Correctness vs jnp.sort checked on device.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from hyperreel_tpu.ops.sort_network import bitonic_sort, _passes


def wide_sort(x, s=32):
    B, n = x.shape
    g = 128 // n
    y = x.reshape(B // g, g * n)
    lane = jnp.arange(g * n)
    local = lane % n
    for k, j in _passes(n):
        is_lo = (local & j) == 0
        keep_min = ((local & k) == 0) == is_lo
        partner = jnp.where(is_lo,
                            jnp.roll(y, -j, axis=-1),
                            jnp.roll(y, j, axis=-1))
        y = jnp.where(keep_min,
                      jnp.minimum(y, partner),
                      jnp.maximum(y, partner))
    return y.reshape(B, n)


def log(*a):
    print(*a, flush=True)


def time_chained(jfn, x, iters=8):
    out = jfn(x)
    out.block_until_ready()
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(iters):
        out = jfn(x + carry * 1e-12 + i * 1e-7)
        carry = jnp.sum(out[::4096])
    float(carry)
    return (time.perf_counter() - t0) / iters


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.2, 3.5, (262144, 32)).astype(np.float32))

    ref = jnp.sort(np.asarray(x), axis=-1)
    a = bitonic_sort(x)
    b = wide_sort(x)
    log("reshape-based correct:", bool(jnp.all(a == ref)))
    log("wide-lane correct:   ", bool(jnp.all(b == ref)))

    ja = jax.jit(bitonic_sort)
    jb = jax.jit(wide_sort)
    log("compiling + timing...")
    ta = time_chained(ja, x)
    tb = time_chained(jb, x)
    log(f"reshape-based: {ta*1e3:7.2f} ms")
    log(f"wide-lane:     {tb*1e3:7.2f} ms")
    log("DONE")


if __name__ == "__main__":
    main()
