"""Probe 3: bisect the fused-kernel TPU parity failure.

Suspects: (a) bf16 [blk, 64] input blocks under a grid, (b) gridded 1D
block specs (probe 2 tested them gridless), (c) narrow [tile, 9] blocks,
(d) the full kernel vs interpret mode on identical random inputs,
(e) per-stage intermediates."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def probe(name, fn, want=None, atol=1e-6):
    try:
        out = fn()
        out.block_until_ready()
        if want is not None:
            err = np.abs(np.asarray(out, np.float32)
                         - np.asarray(want, np.float32)).max()
            log(f"OK   {name}: maxerr={err:.6f} (atol {atol}) "
                f"{'PASS' if err <= atol else '*** FAIL ***'}")
        else:
            log(f"OK   {name}")
        return np.asarray(out)
    except Exception as e:
        log(f"FAIL {name}: {type(e).__name__}: {str(e)[:150]}")
        return None


def main():
    log("devices:", jax.devices())
    nblk, blk = 4, 2048

    # (a) gridded bf16 [blk, 64] roundtrip — exact (input already bf16)
    xb = jnp.asarray(
        np.random.randn(nblk * blk, 64).astype(np.float32), jnp.bfloat16)

    def ka(i_ref, o_ref):
        o_ref[:] = i_ref[:].astype(jnp.float32)
    want = np.asarray(xb.astype(jnp.float32))
    probe("a: gridded bf16 (2048,64) block read", lambda: pl.pallas_call(
        ka, grid=(nblk,),
        in_specs=[pl.BlockSpec((blk, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * blk, 64), jnp.float32))(xb),
        want=want, atol=0.0)

    # (b) gridded 1D (blk,) block reads
    v = jnp.asarray(np.random.randn(nblk * blk).astype(np.float32))

    def kb(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(blk, 1) * 2.0
    probe("b: gridded 1D (2048,) block", lambda: pl.pallas_call(
        kb, grid=(nblk,),
        in_specs=[pl.BlockSpec((blk,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * blk, 1), jnp.float32))(v),
        want=np.asarray(v).reshape(-1, 1) * 2, atol=0.0)

    # (c) gridded narrow [tile, 9] block + jnp.repeat
    tile, S = 64, 32
    shb = jnp.asarray(np.random.randn(nblk * tile, 9).astype(np.float32))

    def kc(i_ref, o_ref):
        o_ref[:] = jnp.repeat(i_ref[:], S, axis=0)
    probe("c: gridded (64,9) block + repeat", lambda: pl.pallas_call(
        kc, grid=(nblk,),
        in_specs=[pl.BlockSpec((tile, 9), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile * S, 9), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * tile * S, 9),
                                       jnp.float32))(shb),
        want=np.repeat(np.asarray(shb), S, axis=0).reshape(
            nblk, tile, S * 9 // 9, 9).reshape(-1, 9) if False else
        np.concatenate([np.repeat(np.asarray(shb)[i * tile:(i + 1) * tile],
                                  S, axis=0) for i in range(nblk)]),
        atol=0.0)

    # (d) full fused kernel: TPU vs interpret on identical inputs
    from hyperreel_tpu.ops.pallas.shade import fused_shade_composite
    rng = np.random.default_rng(0)
    B, S2, C = 128, 32, 16
    N = B * S2
    W, H, TW, TH = 41, 43, 37, 4
    rt0 = (TH + 2) * (TW + 2)
    Rt = ((rt0 + 127) // 128) * 128
    rows = jnp.asarray(rng.standard_normal((N, 4 * C)).astype(np.float32),
                       jnp.bfloat16)
    xn = jnp.asarray(rng.uniform(-1.2, 1.2, N).astype(np.float32))
    yn = jnp.asarray(rng.uniform(-1.2, 1.2, N).astype(np.float32))
    zn = jnp.asarray(rng.uniform(-1.2, 1.2, N).astype(np.float32))
    tn = jnp.asarray(rng.uniform(-1.2, 1.2, N).astype(np.float32))
    valid = jnp.asarray(
        (rng.uniform(0, 1, N) > 0.1).astype(np.float32))
    cs = tuple(jnp.asarray(rng.uniform(0.5, 1.5, N).astype(np.float32))
               for _ in range(3))
    csh = tuple(jnp.asarray(rng.uniform(-0.1, 0.1, N).astype(np.float32))
                for _ in range(3))
    dists = jnp.asarray(
        np.sort(rng.uniform(0.1, 4.0, (B, S2)).astype(np.float32), 1))
    shb9 = jnp.asarray(rng.standard_normal((B, 9)).astype(np.float32))
    ttab = jnp.asarray(rng.standard_normal((Rt, C)).astype(np.float32))
    ttab = ttab.at[rt0:].set(0.0)
    wb = jnp.asarray(rng.standard_normal((C, 27)).astype(np.float32))

    args = (rows, xn, yn, zn, tn, valid, cs, csh, dists, shb9, ttab, wb)
    kw = dict(W=W, H=H, TW=TW, TH=TH, n_density=8, density_shift=0.0,
              distance_scale=8.0, tile=32)
    out_tpu = probe("d: full kernel on TPU",
                    lambda: fused_shade_composite(
                        *args, **kw, interpret=False))
    out_int = np.asarray(fused_shade_composite(*args, **kw, interpret=True))
    if out_tpu is not None:
        err = np.abs(out_tpu - out_int).max()
        where = np.unravel_index(np.argmax(np.abs(out_tpu - out_int)),
                                 out_tpu.shape)
        log(f"d: tpu-vs-interpret maxerr={err:.6f} at {where} "
            f"(tpu={out_tpu[where]:.4f} int={out_int[where]:.4f})")
        for c in range(8):
            e = np.abs(out_tpu[:, c] - out_int[:, c]).max()
            log(f"   col {c}: maxerr={e:.6f}")

    log("DONE")


if __name__ == "__main__":
    main()
