"""Probe 2: relayout/broadcast mechanisms for the fused shade+composite
kernel. Decides how per-ray [TILE, S] data meets per-sample [TILE*S, C]
data inside one kernel."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def probe(name, fn, want=None, atol=1e-5):
    try:
        t0 = time.perf_counter()
        out = fn()
        out.block_until_ready()
        extra = ""
        if want is not None:
            ok = np.allclose(np.asarray(out), want, atol=atol)
            extra = f" correct={ok}"
        log(f"OK   {name}  ({time.perf_counter()-t0:.1f}s){extra}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:150]
        log(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def main():
    log("devices:", jax.devices())
    R, S = 64, 32          # rays per block, samples per ray
    N = R * S              # 2048

    a = np.arange(R * S, dtype=np.float32).reshape(R, S)
    aj = jnp.asarray(a)

    # P1: reshape [64,32] -> [2048,1]
    def k1(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(N, 1)
    probe("P1 reshape (64,32)->(2048,1)", lambda: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(aj),
        want=a.reshape(N, 1))

    # P4: reshape [2048,1] -> [64,32]
    def k4(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(R, S)
    probe("P4 reshape (2048,1)->(64,32)", lambda: pl.pallas_call(
        k4, out_shape=jax.ShapeDtypeStruct((R, S), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(a.reshape(N, 1))),
        want=a)

    # P5: 1D input (2048,) -> (2048,1)
    def k5(i_ref, o_ref):
        o_ref[:] = i_ref[:].reshape(N, 1) * 2.0
    probe("P5 1D block (2048,) -> col", lambda: pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(a.reshape(-1))),
        want=a.reshape(N, 1) * 2)

    # P6: jnp.repeat per-ray -> per-sample (axis 0, repeats=S)
    b = np.arange(R * 9, dtype=np.float32).reshape(R, 9)
    bj = jnp.asarray(b)

    def k6(i_ref, o_ref):
        o_ref[:] = jnp.repeat(i_ref[:], S, axis=0)
    probe("P6 jnp.repeat [64,9]->[2048,9]", lambda: pl.pallas_call(
        k6, out_shape=jax.ShapeDtypeStruct((N, 9), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(bj),
        want=np.repeat(b, S, axis=0))

    # P7: pltpu.repeat semantics
    def k7(i_ref, o_ref):
        o_ref[:] = pltpu.repeat(i_ref[:], S, axis=0)
    probe("P7 pltpu.repeat [64,9]x32 (tile or interleave?)",
          lambda: pl.pallas_call(
              k7, out_shape=jax.ShapeDtypeStruct((N, 9), jnp.float32),
              in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
              out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(bj),
          want=np.repeat(b, S, axis=0))

    # P8: lane-slice write out_ref[:, :3] and [:, 3:4]
    def k8(i_ref, o_ref):
        o_ref[:, :3] = i_ref[:][:, :3] * 2.0
        o_ref[:, 3:4] = i_ref[:][:, 4:5]
    x4 = np.random.randn(N, 8).astype(np.float32)
    probe("P8 lane-slice writes", lambda: pl.pallas_call(
        k8, out_shape=jax.ShapeDtypeStruct((N, 4), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(x4)),
        want=np.concatenate([x4[:, :3] * 2, x4[:, 4:5]], 1))

    # P9: broadcast [2048,1] col against [2048,64]
    def k9(c_ref, m_ref, o_ref):
        o_ref[:] = c_ref[:] * m_ref[:]
    c = np.random.randn(N, 1).astype(np.float32)
    m = np.random.randn(N, 64).astype(np.float32)
    probe("P9 col-broadcast multiply", lambda: pl.pallas_call(
        k9, out_shape=jax.ShapeDtypeStruct((N, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(c), jnp.asarray(m)),
        want=c * m)

    # P10: floor/clip/astype int32 + compare-select four-hot build + dot
    Rt = 128

    def k10(z_ref, tab_ref, o_ref):
        z = z_ref[:].reshape(N, 1)
        zi = jnp.floor(z)
        w1 = z - zi
        base = zi.astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (N, Rt), 1)
        A = (jnp.where(iota == base, 1.0 - w1, 0.0)
             + jnp.where(iota == base + 1, w1, 0.0))
        o_ref[:] = jax.lax.dot_general(
            A.astype(jnp.bfloat16), tab_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    z = np.random.uniform(0, Rt - 1.01, (R, S)).astype(np.float32)
    tab = np.random.randn(Rt, 16).astype(np.float32)
    zi = np.floor(z.reshape(-1)).astype(int)
    w1 = z.reshape(-1) - zi
    want = tab[zi] * (1 - w1)[:, None] + tab[zi + 1] * w1[:, None]
    probe("P10 [64,32] coords -> two-hot dot", lambda: pl.pallas_call(
        k10, out_shape=jax.ShapeDtypeStruct((N, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(z), jnp.asarray(tab)),
        want=want, atol=5e-2)

    # P11: static one-hot ray<->sample matmuls (fallback mechanism)
    def k11(v_ref, o_ref):
        v = v_ref[:]                                   # [R, S]
        sub = jax.lax.broadcasted_iota(jnp.int32, (N, R), 0) // S
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, R), 1)
        A2 = jnp.where(sub == lane, 1.0, 0.0).astype(jnp.bfloat16)
        tmp = jax.lax.dot_general(
            A2, v.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [N, S]
        ssel = (jax.lax.broadcasted_iota(jnp.int32, (N, S), 0) % S
                == jax.lax.broadcasted_iota(jnp.int32, (N, S), 1))
        o_ref[:] = jnp.sum(jnp.where(ssel, tmp, 0.0), 1, keepdims=True)
    probe("P11 static one-hot flatten", lambda: pl.pallas_call(
        k11, out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(aj),
        want=a.reshape(N, 1), atol=1e-2)

    # P12: bf16 input block [2048, 64]
    def k12(i_ref, o_ref):
        o_ref[:] = i_ref[:].astype(jnp.float32) * 2.0
    xb = np.random.randn(N, 64).astype(np.float32)
    probe("P12 bf16 input block", lambda: pl.pallas_call(
        k12, out_shape=jax.ShapeDtypeStruct((N, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(xb, jnp.bfloat16)),
        want=xb.astype(np.float32) * 2, atol=2e-2)

    log("DONE")


if __name__ == "__main__":
    main()
