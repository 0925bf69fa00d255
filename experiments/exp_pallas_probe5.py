"""Probe Mosaic support for the round-3b pack-build kernel constructs
(sublane rolls for the in-kernel bitonic sort, sublane strided slices for
field extraction, int32 index outputs, SMEM scalar ctx.it, sublane->lane
reshapes). One feature per probe so the remote AOT helper's opaque HTTP
500s stay bisectable (same pattern as exp_pallas_probe.py)."""

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
            if err > 1e-5:
                log(f"WRONG {name}: {err}")
                return False
        log(f"OK   {name}  ({time.perf_counter()-t0:.1f}s){ok}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        log(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


S, T = 32, 128


def vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def main():
    log("devices:", jax.devices())
    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.randn(S, T).astype(np.float32))
    x480 = jnp.asarray(rng.randn(S * 15, T).astype(np.float32))

    # 1. sublane roll (the in-kernel bitonic partner fetch)
    def k_roll(i_ref, o_ref):
        o_ref[:] = pltpu.roll(i_ref[:], 1, 0)
    probe("sublane roll [32,128]", lambda: pl.pallas_call(
        k_roll, out_shape=jax.ShapeDtypeStruct((S, T), jnp.float32),
        in_specs=[vmem()], out_specs=vmem())(x32),
        check=lambda o: np.abs(o - np.roll(np.asarray(x32), 1, 0)).max())

    # 2. full bitonic sort along sublanes via rolls + iota masks
    def k_sort(i_ref, o_ref):
        v = i_ref[:]
        idx = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0)
        k = 2
        while k <= S:
            j = k // 2
            while j >= 1:
                up = pltpu.roll(v, S - j, 0)     # v[(i+j) % S]
                dn = pltpu.roll(v, j, 0)         # v[(i-j) % S]
                lo_half = (idx & j) == 0
                partner = jnp.where(lo_half, up, dn)
                asc = (idx & k) == 0
                take_min = asc == lo_half
                v = jnp.where(take_min, jnp.minimum(v, partner),
                              jnp.maximum(v, partner))
                j //= 2
            k *= 2
        o_ref[:] = v
    probe("bitonic sort sublanes [32,128]", lambda: pl.pallas_call(
        k_sort, out_shape=jax.ShapeDtypeStruct((S, T), jnp.float32),
        in_specs=[vmem()], out_specs=vmem())(x32),
        check=lambda o: np.abs(o - np.sort(np.asarray(x32), 0)).max())

    # 3. strided sublane slice (field extraction in prediction order)
    def k_stride(i_ref, o_ref):
        o_ref[:] = i_ref[:][3::15] * 2.0
    probe("strided sublane slice [480->32]", lambda: pl.pallas_call(
        k_stride, out_shape=jax.ShapeDtypeStruct((S, T), jnp.float32),
        in_specs=[vmem()], out_specs=vmem())(x480),
        check=lambda o: np.abs(o - 2 * np.asarray(x480)[3::15]).max())

    # 4. int32 compute + output (gather index build)
    def k_int(i_ref, o_ref):
        xi = jnp.floor(i_ref[:] * 7.0).astype(jnp.int32)
        o_ref[:] = jnp.clip(xi, -1, 6) * 9 + 1
    probe("int32 index output [32,128]", lambda: pl.pallas_call(
        k_int, out_shape=jax.ShapeDtypeStruct((S, T), jnp.int32),
        in_specs=[vmem()], out_specs=vmem())(x32),
        check=lambda o: np.abs(
            o - (np.clip(np.floor(np.asarray(x32) * 7), -1, 6)
                 .astype(np.int32) * 9 + 1)).max())

    # 5. SMEM scalar operand (traced ctx.it into the kernel)
    def k_smem(s_ref, i_ref, o_ref):
        it = s_ref[0].astype(jnp.float32)
        o_ref[:] = i_ref[:] * jnp.clip(it / 100.0, 0.0, 1.0)
    probe("SMEM scalar ctx.it", lambda: pl.pallas_call(
        k_smem, out_shape=jax.ShapeDtypeStruct((S, T), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem()],
        out_specs=vmem())(jnp.asarray([50], jnp.int32), x32),
        check=lambda o: np.abs(o - np.asarray(x32) * 0.5).max())

    # 6. sublane->lane reshape (would kill the XLA block reorder)
    def k_resh(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(1, S * T)
    probe("reshape [32,128]->[1,4096]", lambda: pl.pallas_call(
        k_resh, out_shape=jax.ShapeDtypeStruct((1, S * T), jnp.float32),
        in_specs=[vmem()], out_specs=vmem())(x32),
        check=lambda o: np.abs(o.reshape(S, T) - np.asarray(x32)).max())

    # 7. [S,1] lane-slice broadcast against [S,T] (samples/z_scale consts)
    c = jnp.asarray(rng.randn(S, 128).astype(np.float32))

    def k_bcast(c_ref, i_ref, o_ref):
        o_ref[:] = i_ref[:] * c_ref[:][:, 0:1] + c_ref[:][:, 1:2]
    probe("[S,1] lane-slice broadcast", lambda: pl.pallas_call(
        k_bcast, out_shape=jax.ShapeDtypeStruct((S, T), jnp.float32),
        in_specs=[vmem(), vmem()], out_specs=vmem())(c, x32),
        check=lambda o: np.abs(
            o - (np.asarray(x32) * np.asarray(c)[:, 0:1]
                 + np.asarray(c)[:, 1:2])).max())

    # 8. 16-part sublane concat to [512, 128] (pack assembly)
    def k_cat(i_ref, o_ref):
        v = i_ref[:]
        o_ref[:] = jnp.concatenate([v + float(i) for i in range(16)], 0)
    probe("concat 16x[32,128] sublanes", lambda: pl.pallas_call(
        k_cat, out_shape=jax.ShapeDtypeStruct((16 * S, T), jnp.float32),
        in_specs=[vmem()], out_specs=vmem())(x32),
        check=lambda o: np.abs(
            o - np.concatenate([np.asarray(x32) + i for i in range(16)],
                               0)).max())

    # 9. jnp.round (get_base_time keyframe snap)
    def k_round(i_ref, o_ref):
        o_ref[:] = jnp.round(i_ref[:] * 3.0)
    probe("jnp.round", lambda: pl.pallas_call(
        k_round, out_shape=jax.ShapeDtypeStruct((S, T), jnp.float32),
        in_specs=[vmem()], out_specs=vmem())(x32),
        check=lambda o: np.abs(o - np.round(np.asarray(x32) * 3.0,
                                            0)).max())

    # 10. grid + multi-output (pack + idx in one kernel)
    def k_multi(i_ref, p_ref, ix_ref):
        v = i_ref[:]
        p_ref[:] = jnp.concatenate([v, v * 2.0], 0)
        ix_ref[:] = jnp.floor(v * 5.0).astype(jnp.int32)
    probe("grid(4) dual output", lambda: pl.pallas_call(
        k_multi,
        grid=(4,),
        in_specs=[pl.BlockSpec((S, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((2 * S, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((2 * S, 4 * T), jnp.float32),
                   jax.ShapeDtypeStruct((S, 4 * T), jnp.int32)],
        )(jnp.asarray(rng.randn(S, 4 * T).astype(np.float32))))


if __name__ == "__main__":
    main()
