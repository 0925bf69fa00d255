"""Bisect which Pallas constructs compile through the axon remote AOT
helper (the HTTP 500 hides the Mosaic error text, so probe one feature at
a time)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def probe(name, fn):
    try:
        t0 = time.perf_counter()
        out = fn()
        out = jax.tree.leaves(out)[0]
        out.block_until_ready()
        log(f"OK   {name}  ({time.perf_counter()-t0:.1f}s)")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        log(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def main():
    log("devices:", jax.devices())
    B, C = 1024, 16

    x = jnp.asarray(np.random.randn(B, 128).astype(np.float32))
    u = jnp.asarray(np.random.randint(0, 1 << 30, (B, 128), np.uint32))

    # 1. trivial copy
    def k_copy(i_ref, o_ref):
        o_ref[:] = i_ref[:] * 2.0
    probe("copy [1024,128] f32", lambda: pl.pallas_call(
        k_copy, out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))

    # 2. existing composite kernel
    def run_composite():
        from hyperreel_tpu.ops.pallas.composite import composite_pallas
        sigma = jnp.abs(x[:, :32])
        dist = jnp.cumsum(jnp.abs(x[:, 32:64]), 1)
        rgb = jnp.stack([x[:, :32]] * 3, -1)
        return composite_pallas(sigma, dist, rgb, 4.0, tile=512)
    probe("composite_pallas tile=512", run_composite)

    # 3. bitcast u32 -> bf16 pairs
    def k_bitcast(i_ref, o_ref):
        v = pltpu.bitcast(i_ref[:], jnp.bfloat16)  # ?
        o_ref[:] = v.astype(jnp.float32)[:, :128]
    probe("pltpu.bitcast u32->bf16", lambda: pl.pallas_call(
        k_bitcast, out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(u))

    def k_bitcast2(i_ref, o_ref):
        v = jax.lax.bitcast_convert_type(i_ref[:], jnp.bfloat16)
        o_ref[:] = v.reshape(B, 256).astype(jnp.float32)[:, :128]
    probe("lax.bitcast u32->bf16[...,2]", lambda: pl.pallas_call(
        k_bitcast2, out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(u))

    # 4. 2D transpose
    def k_t(i_ref, o_ref):
        o_ref[:] = i_ref[:].T
    probe("transpose [1024,128]->[128,1024]", lambda: pl.pallas_call(
        k_t, out_shape=jax.ShapeDtypeStruct((128, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))

    # 5. 3D reshape+transpose (the grouped relayout)
    def k_rt(i_ref, o_ref):
        v = i_ref[:].reshape(B, 8, 16)
        v = jnp.transpose(v, (2, 0, 1))
        o_ref[:] = v.reshape(16, B * 8)
    probe("grouped relayout reshape+transpose3d", lambda: pl.pallas_call(
        k_rt, out_shape=jax.ShapeDtypeStruct((16, B * 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))

    # 6. iota + compare + select
    def k_iota(i_ref, o_ref):
        idx = i_ref[:, :1].astype(jnp.int32) % 128
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        o_ref[:] = jnp.where(iota == idx, 1.0, 0.0)
    probe("iota+compare+select", lambda: pl.pallas_call(
        k_iota, out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))

    # 7. dot_general bf16 with small N
    w16 = jnp.asarray(np.random.randn(128, C).astype(np.float32))

    def k_dot16(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:].astype(jnp.bfloat16), b_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    probe("dot [1024,128]x[128,16] bf16", lambda: pl.pallas_call(
        k_dot16, out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, w16))

    w128 = jnp.asarray(np.random.randn(128, 128).astype(np.float32))

    def k_dot128(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:].astype(jnp.bfloat16), b_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    probe("dot [1024,128]x[128,128] bf16", lambda: pl.pallas_call(
        k_dot128, out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, w128))

    # 8. fused iota-select + dot (the two-hot kernel core)
    def k_twohot(z_ref, t_ref, o_ref):
        z = z_ref[:, 0]
        zi = jnp.floor(z)
        w1 = z - zi
        zi = zi.astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        A = (jnp.where(iota == zi[:, None], 1.0 - w1[:, None], 0.0)
             + jnp.where(iota == zi[:, None] + 1, w1[:, None], 0.0))
        o_ref[:] = jax.lax.dot_general(
            A.astype(jnp.bfloat16), t_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    z = jnp.asarray(np.random.uniform(0, 126.9, (B, 1)).astype(np.float32))
    tab = jnp.asarray(np.random.randn(128, C).astype(np.float32))
    ok = probe("two-hot kernel (iota+dot)", lambda: pl.pallas_call(
        k_twohot, out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(z, tab))
    if ok:
        out = pl.pallas_call(
            k_twohot, out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(z, tab)
        zz = np.asarray(z[:4, 0])
        zi = np.floor(zz).astype(int)
        w1 = zz - zi
        want = (np.asarray(tab)[zi] * (1 - w1)[:, None]
                + np.asarray(tab)[zi + 1] * w1[:, None])
        log("   two-hot correct:", np.allclose(np.asarray(out[:4]), want,
                                               atol=2e-2))

    # 9. cumsum-ish shifted adds along lanes (composite inner op)
    def k_shift(i_ref, o_ref):
        acc = i_ref[:]
        out = jnp.concatenate([jnp.zeros_like(acc[:, :1]), acc[:, :-1]], 1)
        o_ref[:] = acc + out
    probe("lane shift-add concat", lambda: pl.pallas_call(
        k_shift, out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))

    # 10. grid + index_map blocks (like real kernels use)
    def k_copy2(i_ref, o_ref):
        o_ref[:] = i_ref[:] + 1.0
    probe("grid=8 blocked copy", lambda: pl.pallas_call(
        k_copy2, grid=(8,),
        out_shape=jax.ShapeDtypeStruct((8 * B, 128), jnp.float32),
        in_specs=[pl.BlockSpec((B, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM))(
            jnp.tile(x, (8, 1))))

    log("DONE")


if __name__ == "__main__":
    main()
