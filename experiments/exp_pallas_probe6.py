"""Probe round-3b pack-build kernel: full prototype (field extraction
via FIELD-MAJOR contiguous sublane slices — probe5 showed strided
sublane slices do NOT lower — in-kernel bitonic sort, point math, pack
assembly in S-major block order, int32 gather-index dual output) checked
against a jnp reference and timed at eval-chunk size."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def probe(name, fn, check=None):
    try:
        t0 = time.perf_counter()
        out = fn()
        leaves = jax.tree.leaves(out)
        for o in leaves:
            o.block_until_ready()
        ok = ""
        if check is not None:
            err = check(*[np.asarray(o) for o in leaves])
            ok = f" maxerr={err:.2e}"
            if err > 2e-5:
                log(f"WRONG {name}: {err}")
                return False
        log(f"OK   {name}  ({time.perf_counter()-t0:.1f}s){ok}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        log(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


S, P, T = 32, 15, 128     # samples, preds/z, rays per block


def vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def bitonic_sublane(v, n):
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            up = pltpu.roll(v, n - j, 0)
            dn = pltpu.roll(v, j, 0)
            lo_half = (idx & j) == 0
            partner = jnp.where(lo_half, up, dn)
            take_min = ((idx & k) == 0) == lo_half
            v = jnp.where(take_min, jnp.minimum(v, partner),
                          jnp.maximum(v, partner))
            j //= 2
        k *= 2
    return v


def main():
    log("devices:", jax.devices())
    rng = np.random.RandomState(0)

    # 1. contiguous sublane slice of a ref (field-major extraction)
    xa = jnp.asarray(rng.randn(S * P, T).astype(np.float32))

    def k_slice(i_ref, o_ref):
        o_ref[:] = i_ref[3 * S:(3 + 1) * S] * 2.0
    probe("contiguous ref slice [480]->[32]", lambda: pl.pallas_call(
        k_slice, out_shape=jax.ShapeDtypeStruct((S, T), jnp.float32),
        in_specs=[vmem()], out_specs=vmem())(xa),
        check=lambda o: np.abs(o - 2 * np.asarray(xa)[3 * S:4 * S]).max())

    # 2. reshape [32, 64] -> [1, 2048] (tile=64 block order)
    xb = jnp.asarray(rng.randn(S, 64).astype(np.float32))

    def k_resh64(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(1, S * 64)
    probe("reshape [32,64]->[1,2048]", lambda: pl.pallas_call(
        k_resh64, out_shape=jax.ShapeDtypeStruct((1, S * 64), jnp.float32),
        in_specs=[vmem()], out_specs=vmem())(xb),
        check=lambda o: np.abs(o.reshape(S, 64) - np.asarray(xb)).max())

    # 3. reshape [16, 128] -> [1, 2048] (compacted k=16 pack rows)
    xc = jnp.asarray(rng.randn(16, T).astype(np.float32))

    def k_resh16(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(1, 16 * T)
    probe("reshape [16,128]->[1,2048]", lambda: pl.pallas_call(
        k_resh16, out_shape=jax.ShapeDtypeStruct((1, 16 * T), jnp.float32),
        in_specs=[vmem()], out_specs=vmem())(xc),
        check=lambda o: np.abs(o.reshape(16, T) - np.asarray(xc)).max())

    # 4. full prototype pack-build kernel, B = 262144 rays
    B = 262144
    W = H = 63
    out_cf = rng.randn(S * P, B).astype(np.float32)
    rays8 = rng.randn(8, B).astype(np.float32)
    rays8[5] = np.sign(rays8[5]) * np.maximum(np.abs(rays8[5]), 0.1)

    def ref_np(out_cf, rays8):
        # field-major rows: field f channel c at [(off+c)*S:(off+c+1)*S]
        z = 1.0 / (1.0 + np.exp(-out_cf[0 * S:1 * S]))      # sigmoid
        poff = [np.tanh(out_cf[(1 + c) * S:(2 + c) * S]) * 0.1
                for c in range(3)]
        o2 = rays8[2]
        dz = rays8[5]
        dists = (z * 2.0 + 0.5 - o2[None]) / dz[None]
        dists = np.where(dists <= 0.0, 1e8, dists)
        dists = np.sort(dists, 0)[:16]                       # compact 16
        p = [rays8[c][None] + rays8[3 + c][None] * dists + poff[c][:16]
             for c in range(3)]
        xn = p[0] * 0.4
        yn = p[1] * 0.4
        px = (xn + 1.0) * 0.5 * (W - 1)
        py = (yn + 1.0) * 0.5 * (H - 1)
        xi = np.clip(np.floor(px), -1, W - 1).astype(np.int32) + 1
        yi = np.clip(np.floor(py), -1, H - 1).astype(np.int32) + 1
        idx = yi * (W + 1) + xi
        # S-major block order, tile=T
        def tbo(a):
            return a.reshape(16, B // T, T).transpose(1, 0, 2).reshape(-1)
        pack = np.stack([tbo(xn), tbo(yn), tbo(dists)], 0)
        return pack, tbo(idx)

    def k_pack(cf_ref, r_ref, pack_ref, idx_ref):
        z = 1.0 / (1.0 + jnp.exp(-cf_ref[0 * S:1 * S]))
        o2 = r_ref[2:3]
        dz = r_ref[5:6]
        dists = (z * 2.0 + 0.5 - o2) / dz
        dists = jnp.where(dists <= 0.0, 1e8, dists)
        dists = bitonic_sublane(dists, S)[:16]
        rows = []
        for c in range(3):
            poff = jnp.tanh(cf_ref[(1 + c) * S:(1 + c) * S + 16]) * 0.1
            rows.append(r_ref[c:c + 1] + r_ref[3 + c:4 + c] * dists
                        + poff)
        # NOTE: poff must be sliced in SORTED order in the real kernel;
        # here the ref applies the same first-16 positional slice so the
        # math matches (prediction-index order, like the general path)
        xn = rows[0] * 0.4
        yn = rows[1] * 0.4
        px = (xn + 1.0) * 0.5 * (W - 1)
        py = (yn + 1.0) * 0.5 * (H - 1)
        xi = (jnp.clip(jnp.floor(px), -1, W - 1) + 1).astype(jnp.int32)
        yi = (jnp.clip(jnp.floor(py), -1, H - 1) + 1).astype(jnp.int32)
        idx = yi * (W + 1) + xi
        pack_ref[:] = jnp.concatenate(
            [xn.reshape(1, 16 * T), yn.reshape(1, 16 * T),
             dists.reshape(1, 16 * T)], 0)
        idx_ref[:] = jnp.concatenate(
            [idx.reshape(1, 16 * T)] * 8, 0)

    def run_pack():
        return pl.pallas_call(
            k_pack,
            grid=(B // T,),
            in_specs=[
                pl.BlockSpec((S * P, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((3, 16 * T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 16 * T), lambda i: (0, i),
                             memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((3, 16 * B), jnp.float32),
                jax.ShapeDtypeStruct((8, 16 * B), jnp.int32)],
        )(jnp.asarray(out_cf), jnp.asarray(rays8))

    pack_ref_np, idx_ref_np = ref_np(out_cf, rays8)

    def chk(pack, idx):
        e1 = np.abs(pack - pack_ref_np).max()
        e2 = np.abs(idx[0] - idx_ref_np).max()
        return max(e1, float(e2))
    if not probe("pack-build prototype [480, 262144]", run_pack, chk):
        return

    # timing: 10 chained calls (readback at the end)
    f = jax.jit(lambda a, b: run_pack2(a, b))

    def run_pack2(a, b):
        return pl.pallas_call(
            k_pack,
            grid=(B // T,),
            in_specs=[
                pl.BlockSpec((S * P, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((3, 16 * T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 16 * T), lambda i: (0, i),
                             memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((3, 16 * B), jnp.float32),
                jax.ShapeDtypeStruct((8, 16 * B), jnp.int32)],
        )(a, b)

    def timed():
        a = jnp.asarray(out_cf)
        r = jnp.asarray(rays8)
        p, ix = f(a, r)
        p.block_until_ready()
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            p, ix = f(a, r)
            # chain: next input depends on this output (identical queued
            # calls collapse through the tunnel — CLAUDE.md timing rule)
            a = a + p[0, 0] * 0.0
        float(p[0, 0])
        dt = (time.perf_counter() - t0) / n
        log(f"pack-build kernel: {dt*1e3:.2f} ms per 262144-ray chunk")
        return p
    probe("pack-build timing", timed)


if __name__ == "__main__":
    main()
