"""Probe 8: in-kernel positional STRIDE subselection for the pack-build
kernel (the reference's inference_samples knob).

Strided sublane slices (x[::stride]) don't lower in Mosaic
(exp_pallas_probe5.py), which is why stride mode keeps the legacy
CF-XLA embedding tail. Candidate workaround: merge sublanes into lanes
with a reshape, then take a CONTIGUOUS lane slice:

    x[S, T] -> reshape(k, stride*T) -> [:, :T]     (rows 0, stride, ...)

The [k*stride, T] -> [k, stride*T] reshape is the same class as the
[k, T] -> [1, k*T] reshape the pack kernel already uses (lowers only at
T=128 — exp_pallas_probe6.py), and the lane slice is offset-0 width-128.

Checks (on real TPU):
  A. reshape+slice correctness vs numpy at S=32, stride in {2, 4}, T=128
  B. same for f32 AND the int32 iota-carrying rows (field-index math)
  C. a sorted-dists + field-rows joint subselect (the pack kernel's
     actual usage shape), timed at bench scale for lowering sanity
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def log(*a):
    print(*a, flush=True)


def make_kernel(S, T, stride):
    k = S // stride

    def kern(x_ref, o_ref):
        x = x_ref[:]                                    # [S, T]
        sel = x.reshape(k, stride * T)[:, :T]           # rows ::stride
        o_ref[:, :] = sel

    return kern


def run_case(S, T, stride, dtype):
    k = S // stride
    x = np.arange(S * T, dtype=np.float32).reshape(S, T)
    if dtype == jnp.int32:
        x = x.astype(np.int32)
    out = pl.pallas_call(
        make_kernel(S, T, stride),
        out_shape=jax.ShapeDtypeStruct((k, T), dtype),
    )(jnp.asarray(x))
    want = x[::stride]
    got = np.asarray(out)
    ok = np.array_equal(got, want)
    log(f"S={S} T={T} stride={stride} {np.dtype(dtype.dtype).name if hasattr(dtype,'dtype') else dtype}: "
        f"{'OK' if ok else 'MISMATCH'}")
    if not ok:
        log("  want[0,:4]", want[0, :4], "got[0,:4]", got[0, :4])
        log("  want[1,:4]", want[1, :4], "got[1,:4]", got[1, :4])
    return ok


def main():
    log("devices:", jax.devices())
    ok = True
    for stride in (2, 4):
        ok &= run_case(32, 128, stride, jnp.float32)
    ok &= run_case(32, 128, 2, jnp.int32)
    # grid-blocked version at bench-ish scale: 2048 tiles of [32, 128]
    S, T, stride = 32, 128, 2
    k = S // stride
    nb = 2048

    def kern(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:, :] = x.reshape(k, stride * T)[:, :T]

    x = np.random.default_rng(0).normal(
        size=(nb * S, T)).astype(np.float32)
    f = jax.jit(lambda xx: pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec((S, T), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((k, T), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * k, T), jnp.float32),
    )(xx))
    got = np.asarray(f(jnp.asarray(x)))
    want = x.reshape(nb, S, T)[:, ::stride].reshape(nb * k, T)
    blocked_ok = np.allclose(got, want)
    log(f"grid-blocked nb={nb}: {'OK' if blocked_ok else 'MISMATCH'}")
    ok &= blocked_ok
    log("PROBE8", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
