"""Quad-backward coord-grad gather elimination probe (round 5).

After the sorted window-matmul scatter landed, the grid-800 train step
is 89.8 ms/step and its top costs are TWO identical per-row gathers
(147 ms/8-step each): the forward quad gather and the backward's
coord-grad RE-gather (grid_sample.py:283-294). The re-gather exists
because the forward's rows are N-major ([N, 4C] — the per-row trick)
while the backward contraction was written CF-major.

Variants probed at the grid-800 backward shape (H=W=800, C=16,
N=524288, f32 tables):
  v0: current custom VJP (re-gather)
  v1: residual-q + dot_general batch-N contraction
      (q [N, 4, C2*2] x g_nm [N, C2*2] -> s [N, 4]; needs g transposed
      [C2, N, 2] -> [N, C2, 2] — minor dim intact)
  v2: residual-q + 4x elementwise-sum contraction in N-major
Each timed as full jax.grad of sum(out * cot) including forward, so
the delta isolates the backward change. Parity vs v0 gates each.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.ops import grid_sample as GS


def log(*a):
    print(*a, flush=True)


import os

if os.environ.get("EXP_SMALL") == "1":   # CPU smoke
    H = W = 50
    C = 16
    N = 8192
else:
    H = W = 800
    C = 16
    N = 524288


def timeit(f, *args, n=5):
    o = f(*args)
    jax.block_until_ready(o)
    outs = None
    variants = [args[0] + i * 1e-7 for i in range(n)]
    for v in variants:
        v.block_until_ready()
    t0 = time.perf_counter()
    outs = [f(v, *args[1:]) for v in variants]
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), outs[-1])
    # value readback (tunnel-trustworthy sync)
    float(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def fwd_with_q(grid_hwc, coords):
    """Quad forward that ALSO returns the gathered corner rows q
    ([N, 4, C//2, 2] f32) for residual reuse."""
    Hh, Ww, Cc = grid_hwc.shape
    x = GS._unnormalize(coords[..., 0], Ww)
    y = GS._unnormalize(coords[..., 1], Hh)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    p = jnp.pad(grid_hwc, ((1, 1), (1, 1), (0, 0)))
    pack = jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], -1)
    R = (Hh + 1) * (Ww + 1)
    xi = (jnp.clip(x0, -1, Ww - 1) + 1).astype(jnp.int32)
    yi = (jnp.clip(y0, -1, Hh - 1) + 1).astype(jnp.int32)
    idx = yi * (Ww + 1) + xi

    def wmask(yc, xc, w):
        inb = (xc >= 0) & (xc <= Ww - 1) & (yc >= 0) & (yc <= Hh - 1)
        return w * inb.astype(jnp.float32)

    w4 = jnp.stack(
        [wmask(y0, x0, (1.0 - wy1) * (1.0 - wx1)),
         wmask(y0, x0 + 1.0, (1.0 - wy1) * wx1),
         wmask(y0 + 1.0, x0, wy1 * (1.0 - wx1)),
         wmask(y0 + 1.0, x0 + 1.0, wy1 * wx1)], -1)
    n = idx.shape[0]
    rows = pack.reshape(R, 4 * Cc)[idx]
    q = rows.reshape(n, 4, Cc // 2, 2)
    out_row = jnp.sum(q * w4[:, :, None, None], axis=1)
    return jnp.moveaxis(out_row, 0, 1), q


def bwd_from_q(q, grid_shape, coords, g, variant):
    """Coord-grad from residual q (no re-gather)."""
    Hh, Ww, Cc = grid_shape
    x = GS._unnormalize(coords[..., 0], Ww)
    y = GS._unnormalize(coords[..., 1], Hh)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    def inb(yc, xc):
        return ((xc >= 0) & (xc <= Ww - 1) & (yc >= 0)
                & (yc <= Hh - 1)).astype(jnp.float32)

    i00 = inb(y0, x0)
    i01 = inb(y0, x0 + 1.0)
    i10 = inb(y0 + 1.0, x0)
    i11 = inb(y0 + 1.0, x0 + 1.0)
    n = coords.shape[0]
    if variant == "dot":
        g_nm = jnp.moveaxis(g, 1, 0).reshape(n, Cc)       # [N, C]
        s_nm = jax.lax.dot_general(
            q.reshape(n, 4, Cc), g_nm[:, :, None],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [N, 4, 1]
        s = s_nm[:, :, 0]                                 # [N, 4]
        s00, s01, s10, s11 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
    else:
        g_nm = jnp.moveaxis(g, 1, 0)                      # [N, C2, 2]
        sv = jnp.sum(q * g_nm[:, None], axis=(2, 3))      # [N, 4]
        s00, s01, s10, s11 = sv[:, 0], sv[:, 1], sv[:, 2], sv[:, 3]
    s00 = s00 * i00
    s01 = s01 * i01
    s10 = s10 * i10
    s11 = s11 * i11
    dwx = (-(1.0 - wy1) * s00 + (1.0 - wy1) * s01
           - wy1 * s10 + wy1 * s11)
    dwy = (-(1.0 - wx1) * s00 - wx1 * s01
           + (1.0 - wx1) * s10 + wx1 * s11)
    return jnp.stack(
        [dwx * 0.5 * (Ww - 1), dwy * 0.5 * (Hh - 1)], -1)


def grid_grad_scatter(coords, g):
    """Grid gradient only (the production packed-scatter section of
    GS._quad2d_bwd, minus its coord-grad re-gather)."""
    x = GS._unnormalize(coords[..., 0], W)
    y = GS._unnormalize(coords[..., 1], H)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    xi = (jnp.clip(x0, -1, W - 1) + 1).astype(jnp.int32)
    yi = (jnp.clip(y0, -1, H - 1) + 1).astype(jnp.int32)
    idx = yi * (W + 1) + xi

    def inb(yc, xc):
        return ((xc >= 0) & (xc <= W - 1) & (yc >= 0)
                & (yc <= H - 1)).astype(jnp.float32)

    w00 = (1.0 - wy1) * (1.0 - wx1) * inb(y0, x0)
    w01 = (1.0 - wy1) * wx1 * inb(y0, x0 + 1.0)
    w10 = wy1 * (1.0 - wx1) * inb(y0 + 1.0, x0)
    w11 = wy1 * wx1 * inb(y0 + 1.0, x0 + 1.0)
    n = coords.shape[0]
    g_cf = jnp.moveaxis(g, 2, 1).reshape(C, n)
    g_rows = jnp.concatenate(
        [g_cf * w00[None], g_cf * w01[None],
         g_cf * w10[None], g_cf * w11[None]], 0)
    R = (H + 1) * (W + 1)
    pack_g = GS._scatter_add_cf_cols(idx, g_rows, R)
    pg = pack_g.reshape(4, C, H + 1, W + 1)
    g_plane = (pg[0, :, 1:H + 1, 1:W + 1]
               + pg[1, :, 1:H + 1, 0:W]
               + pg[2, :, 0:H, 1:W + 1]
               + pg[3, :, 0:H, 0:W])
    return jnp.moveaxis(g_plane, 0, -1)


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    coords = jnp.asarray(
        rng.uniform(-1.02, 1.02, (N, 2)).astype(np.float32))
    cot = jnp.asarray(
        rng.standard_normal((C // 2, N, 2)).astype(np.float32))

    def loss0(g, c):
        return jnp.sum(GS.grid_sample_2d_cf_quad(g, c) * cot)

    f0 = jax.jit(jax.grad(loss0, argnums=(0, 1)))
    dt0 = timeit(f0, grid, coords)
    gg0, gc0 = f0(grid, coords)
    log(f"v0 current (re-gather bwd):      {dt0*1e3:8.2f} ms")

    for name in ("dot", "sum"):
        @jax.custom_vjp
        def quad_v(g, c):
            return fwd_with_q(g, c)[0]

        def quad_v_fwd(g, c):
            out, q = fwd_with_q(g, c)
            return out, (q, c)

        def quad_v_bwd(res, gct, _name=name):
            q, c = res
            gg = grid_grad_scatter(c, gct)
            gc = bwd_from_q(q, (H, W, C), c, gct, _name)
            return gg, gc

        quad_v.defvjp(quad_v_fwd, quad_v_bwd)

        def loss_v(g, c, _f=quad_v):
            return jnp.sum(_f(g, c) * cot)

        fv = jax.jit(jax.grad(loss_v, argnums=(0, 1)))
        dtv = timeit(fv, grid, coords)
        ggv, gcv = fv(grid, coords)
        dgc = float(jnp.abs(gcv - gc0).max())
        dgg = float(jnp.abs(ggv - gg0).max())
        log(f"v_{_short(name)} residual-q ({name}):    {dtv*1e3:8.2f} ms"
            f"   |dgc| {dgc:.2e} |dgg| {dgg:.2e}")


def _short(n):
    return {"dot": "1", "sum": "2"}[n]


if __name__ == "__main__":
    main()
