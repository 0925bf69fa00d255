"""Patch-blend Pallas kernel: bilinear features from coherent patch
rows (ops/patch_gather.py design).

One (px x py)-texel patch row serves 4 consecutive rays (same sorted
sample slot); this kernel turns the gathered patch rows into per-sample
bilinear features. Output is PHASE-MAJOR — features of sample-lane
4j + p land at [p*C + c, j] — because the in-kernel expansion of a
[P*C, blk/4] patch block to full [*, blk] width has no cheap Mosaic
form (pltpu.repeat is tile-concat, not elementwise; probe9). Each
phase's features are a contiguous lane section of the SAME patch
block, using only known-lowering ops: 2D transpose, contiguous
sublane slices, iota compares, elementwise math.

The hat-weight blend (max(0, 1 - |u - t|)) reproduces exact bilinear
for in-patch offsets and vanishes smoothly for out-of-patch ones
(zero-padding semantics for coverage violations — see
ops/patch_gather.py docstring).

Inputs
  rows [J, px*py*C]   bf16/f32 gathered patch rows, J = N // 4, texel
                      t = ty*px + tx channel-major per row
  uv   [8, J]         f32: rows 0..3 = u offsets for phases 0..3,
                      rows 4..7 = v offsets
Output
  feats [4*C, J]      f32: row p*C + c = channel c of sample 4j + p
"""

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _patch_blend_kernel(rows_ref, uv_ref, o_ref, *, s):
    px, py, C = s.px, s.py, s.C
    patch = rows_ref[:].astype(jnp.float32).T          # [P*C, blkj]
    for p in range(4):
        u = uv_ref[p:p + 1]                            # [1, blkj]
        v = uv_ref[4 + p:5 + p]
        acc = jnp.zeros((C, patch.shape[1]), jnp.float32)
        for ty in range(py):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(v - ty))
            for tx in range(px):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(u - tx))
                t = ty * px + tx
                acc = acc + (wx * wy) * patch[t * C:(t + 1) * C]
        o_ref[p * C:(p + 1) * C, :] = acc.astype(o_ref.dtype)


def patch_blend(rows, uv, *, px, py, C, blkj=1024, out_dtype=jnp.float32,
                interpret=None):
    """Run the patch-blend kernel; returns feats [4*C, J]."""
    J, PC = rows.shape
    assert PC == px * py * C, (PC, px, py, C)
    assert uv.shape == (8, J), uv.shape
    assert J % blkj == 0, (J, blkj)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(
        _patch_blend_kernel, s=SimpleNamespace(px=px, py=py, C=C))
    return pl.pallas_call(
        kern,
        grid=(J // blkj,),
        in_specs=[
            pl.BlockSpec((blkj, PC), lambda i: (i, 0)),
            pl.BlockSpec((8, blkj), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((4 * C, blkj), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((4 * C, J), out_dtype),
        interpret=interpret,
    )(rows, uv)


def patch_index_uv(xt, yt, W, H, px, py):
    """XLA-side anchors/offsets for the patch gather.

    xt, yt: [N] unnormalized texel coords in the shade kernel's lane
    order (4 consecutive lanes = the 4 rays of one block). Returns
    (idx [N//4] int32 rows of the patch table, uv [8, N//4] f32 in the
    blend kernel's phase-major layout)."""
    n = xt.shape[0]
    xb = xt.reshape(n // 4, 4)
    yb = yt.reshape(n // 4, 4)
    x0 = jnp.clip(jnp.floor(xb.min(-1)), -1, W - 1)
    y0 = jnp.clip(jnp.floor(yb.min(-1)), -1, H - 1)
    idx = ((y0 + 1) * (W + 1) + (x0 + 1)).astype(jnp.int32)
    # phase rows via strided slices + stack — NOT a [J, 4].T transpose
    # (the [N, small].T class lowers to a catastrophic while-loop on
    # TPU; PERFORMANCE.md lowering traps)
    uv = jnp.stack([xt[p::4] - x0 for p in range(4)]
                   + [yt[p::4] - y0 for p in range(4)], 0)
    return idx, uv


def phase_major_to_lane_major(feats, C):
    """[4*C, J] phase-major blend output -> [C, 4*J] lane-major (the
    shade kernel's sample-lane order). Interleaves the four phase
    sections via a minor-axis stack + reshape — NOT a transpose (the
    small-minor transpose class lowers to a while-loop on TPU). Cost
    ~the array's bytes in HBM traffic."""
    fc, J = feats.shape
    assert fc == 4 * C
    parts = [feats[p * C:(p + 1) * C] for p in range(4)]
    return jnp.stack(parts, axis=-1).reshape(C, 4 * J)
