"""Patch-blend Pallas kernel: bilinear features from coherent patch
rows (ops/patch_gather.py design).

One (px x py)-texel patch row serves 4 consecutive rays (same sorted
sample slot); this kernel turns the gathered patch rows into per-sample
bilinear features. Output is PHASE-MAJOR — features of original ray
4j + p land at [p*C + c, j] — because the in-kernel expansion of a
[P*C, blk/4] patch block to full [*, blk] width has no cheap Mosaic
form (pltpu.repeat is tile-concat, not elementwise; probe9). The
caller (fused_eval) delivers rays in the matching quarter-major order
(original ray 4j + p at position p*B/4 + j — permuted at chunk entry,
or already phase-major under the rays_phase_major contract), so the
anchor build is an elementwise min of 4 CONTIGUOUS slices and the
phase-major -> lane-major conversion is a BlockSpec index map — zero
strided lane slices, zero minor-dim interleaves (the round-3 collapse;
PERFORMANCE.md).

Per-sample (u, v) offsets are computed IN-KERNEL from the scalar pack's
normalized coordinate rows (one [16, blkj] pack block per phase via
quarter-offset BlockSpec index maps): the round-4 HLO attribution
showed the XLA-side uv build cost ~2.3 ms/chunk — two full-[N] texel
scale passes (multiply fusions), a [N] -> [4, N/4] reshape that lowers
to TWO while-loops, and the [8, J] uv concat's dynamic-update-slices.
All of it replaced by 4 extra VMEM-block reads of rows the shade
kernel streams anyway.

The hat-weight blend (max(0, 1 - |u - t|)) reproduces exact bilinear
for in-patch offsets and vanishes smoothly for out-of-patch ones
(zero-padding semantics for coverage violations — see
ops/patch_gather.py docstring).

Inputs
  rows    [J, px*py*C]  bf16/f32 gathered patch rows, J = N // 4,
                        texel t = ty*px + tx channel-major per row
  anchors [2, J]        f32 texel anchors (x0, y0) per 4-ray block
  pack    [16, N]       the scalar pack; rows m0/m1 hold the
                        normalized plane coords (phase p's samples are
                        the contiguous quarter [p*J, (p+1)*J))
Output
  feats [4*C, J]        row p*C + c = channel c of sample 4j + p
"""

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _patch_blend_kernel(*refs, s):
    px, py, C = s.px, s.py, s.C
    rows_ref, anc_ref = refs[0], refs[1]
    pk_refs, o_ref = refs[2:2 + s.R], refs[2 + s.R]
    patch = rows_ref[:].astype(jnp.float32).T          # [P*C, blkj]
    x0 = anc_ref[0:1]                                  # [1, blkj]
    y0 = anc_ref[1:2]
    for p, pk in enumerate(pk_refs):
        # in-kernel texel scale + anchor offset (bit-identical op order
        # to the former XLA-side ((xn+1)*0.5)*(W-1) pass)
        u = (pk[s.m0:s.m0 + 1] + 1.0) * 0.5 * (s.W - 1) - x0
        v = (pk[s.m1:s.m1 + 1] + 1.0) * 0.5 * (s.H - 1) - y0
        acc = jnp.zeros((C, patch.shape[1]), jnp.float32)
        for ty in range(py):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(v - ty))
            for tx in range(px):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(u - tx))
                t = ty * px + tx
                acc = acc + (wx * wy) * patch[t * C:(t + 1) * C]
        o_ref[p * C:(p + 1) * C, :] = acc.astype(o_ref.dtype)


def patch_blend(rows, anchors, pack, *, m0, m1, W, H, px, py, C,
                blkj=1024, out_dtype=jnp.float32, interpret=None,
                R=4):
    """Run the patch-blend kernel; returns feats [R*C, J] (R = the
    coherent block size — rays per gathered patch row)."""
    J, PC = rows.shape
    assert PC == px * py * C, (PC, px, py, C)
    assert anchors.shape == (2, J), anchors.shape
    R16, N = pack.shape
    assert N == R * J, (N, R, J)
    assert J % blkj == 0, (J, blkj)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(
        _patch_blend_kernel,
        s=SimpleNamespace(px=px, py=py, C=C, m0=m0, m1=m1, W=W, H=H,
                          R=R))
    nb = J // blkj

    def pk_spec(p):
        return pl.BlockSpec((R16, blkj), lambda i, _p=p: (0, i + _p * nb))

    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((blkj, PC), lambda i: (i, 0)),
            pl.BlockSpec((2, blkj), lambda i: (0, i)),
            *[pk_spec(p) for p in range(R)],
        ],
        out_specs=pl.BlockSpec((R * C, blkj), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((R * C, J), out_dtype),
        interpret=interpret,
    )(rows, anchors, *([pack] * R))


def patch_anchor_idx(x_row, y_row, W, H, R=4):
    """XLA-side anchors for the patch gather — PHASE-MAJOR.

    x_row, y_row: [N] NORMALIZED plane coords in the phase-major lane
    order (original ray R*j + p at position p*B/R + j; the R rays of
    each coherent block occupy the same column of R contiguous
    phase sections). The phase min is an elementwise min of R
    CONTIGUOUS slices — the former [N] -> [R, N/R] reshape lowered to
    a ~0.45 ms while-loop each for x and y (round-4 HLO attribution).
    The texel scale is applied AFTER the min (monotone, so min
    commutes bit-exactly) over [J] instead of [N].

    Returns (idx [J] int32 rows of the patch table,
             anchors [2, J] f32 texel (x0, y0))."""
    n = x_row.shape[0]
    q = n // R

    def minR(r):
        acc = None
        for p in range(R):
            s = r[p * q:(p + 1) * q]
            acc = s if acc is None else jnp.minimum(acc, s)
        return acc

    x0 = jnp.clip(jnp.floor((minR(x_row) + 1.0) * 0.5 * (W - 1)),
                  -1, W - 1)
    y0 = jnp.clip(jnp.floor((minR(y_row) + 1.0) * 0.5 * (H - 1)),
                  -1, H - 1)
    idx = ((y0 + 1) * (W + 1) + (x0 + 1)).astype(jnp.int32)
    return idx, jnp.stack([x0, y0], 0)


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
