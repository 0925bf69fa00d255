"""Patch-blend Pallas kernel: bilinear features from coherent patch
rows (ops/patch_gather.py design).

One (px x py)-texel patch row serves 4 consecutive rays (same sorted
sample slot); this kernel turns the gathered patch rows into per-sample
bilinear features. Output is PHASE-MAJOR — features of original ray
4j + p land at [p*C + c, j] — because the in-kernel expansion of a
[P*C, blk/4] patch block to full [*, blk] width has no cheap Mosaic
form (pltpu.repeat is tile-concat, not elementwise; probe9). The
caller (fused_eval) permutes rays at chunk entry to the matching
quarter-major order (original ray 4j + p -> position p*B/4 + j), so
both the anchor/offset build and the phase-major -> lane-major
conversion are elementwise/contiguous — zero strided lane slices,
zero minor-dim interleaves (the round-3 collapse; PERFORMANCE.md).

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
    """XLA-side anchors/offsets for the patch gather — QUARTER-MAJOR.

    xt, yt: [N] unnormalized texel coords in the PHASE-PERMUTED lane
    order (fused_eval permutes rays at chunk entry so original ray
    4j + p sits at position p*B/4 + j; the four rays of each coherent
    block then occupy the same column of four contiguous quarter
    sections). Everything here is elementwise over full-lane rows —
    zero strided lane slices, zero minor-dim reshapes (the round-3
    design's xt[p::4] slices + [N//4, 4] block reduces collapsed to
    0.89 Mrays/s on HW; PERFORMANCE.md round 4). Returns (idx [N//4]
    int32 rows of the patch table, uv [8, N//4] f32 phase-major)."""
    n = xt.shape[0]
    xq = xt.reshape(4, n // 4)
    yq = yt.reshape(4, n // 4)
    x0 = jnp.clip(jnp.floor(xq.min(0)), -1, W - 1)
    y0 = jnp.clip(jnp.floor(yq.min(0)), -1, H - 1)
    idx = ((y0 + 1) * (W + 1) + (x0 + 1)).astype(jnp.int32)
    uv = jnp.concatenate([xq - x0[None], yq - y0[None]], 0)
    return idx, uv


def phase_major_to_lane_major(feats, C):
    """[4*C, J] phase-major blend output -> [C, 4*J] in the PERMUTED
    lane order (phase p's features are the contiguous quarter
    [p*J, (p+1)*J) — matching the ray permutation applied at chunk
    entry). A leading-axis [4, C] transpose with the huge J axis kept
    minor: a plain tiled copy, ~the array's bytes in HBM traffic. The
    round-3 minor-axis stack/reshape interleave this replaces was in
    the catastrophic relayout class (PERFORMANCE.md round 4)."""
    fc, J = feats.shape
    assert fc == 4 * C
    return feats.reshape(4, C, J).transpose(1, 0, 2).reshape(C, 4 * J)
