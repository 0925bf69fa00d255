"""Bilinear grid sampling with PyTorch `F.grid_sample` semantics
(``align_corners=True``, ``padding_mode='zeros'``), the core lookup used by
the factored feature grids (reference: nlf/nets/tensorf_base.py:1059-1100,
nlf/nets/tensorf_dynamic.py:287-371).

TPU-first layout choices:
  * grids carry the channel axis LAST (``[H, W, C]``) so each corner gather is
    a contiguous lane-dim read and the 4-corner lerp vectorises on the VPU;
  * callers pass flat coordinate batches ``[N, 2]`` and receive ``[N, C]``,
    which keeps the downstream component-product a lane-wise multiply.

These are the pure-XLA reference implementations; the fused Pallas render
core builds on the same index math.
"""

import os

import jax
import jax.numpy as jnp

# Sorted window-matmul scatter tile sizes (HW-probed on v5e,
# /tmp/hw_queue/scatter_probe{,2}.log round 5): M samples per tile,
# K-column lane-aligned accumulation window. K must comfortably exceed
# the typical sorted-tile span M * R / N (uniform grid-800 flagship:
# ~990 at M=512, ~2x that at M=1024) plus the <=127 alignment slack; a
# tile that still overflows falls back to a per-tile XLA scatter, so
# exactness never depends on K. M=1024/K=4096 measured ~7% faster than
# 512/2048 (v6b 49.9 vs v6 46.6 M upd/s) and halves the scan length
# (while.31 = 15 ms/step of the grid-800 train step).
_FAST_SCATTER_M = 1024
_FAST_SCATTER_K = 4096
# Use the window-matmul path once the scatter target exceeds what the
# TPU backend keeps VMEM-resident (HBM-resident scatter-add serializes
# at ~190 ns/index; a [64, 2520] VMEM-sized target scatters ~30x
# faster per index — train_trace_800b fusion.446 vs fusion.447).
_FAST_SCATTER_MIN_TABLE_BYTES = 16 << 20


def _scatter_add_cf_cols(idx, rows_cf, R):
    """out[:, idx[i]] += rows_cf[:, i] for an HBM-sized [C4, R] target.

    XLA's scatter-add into an HBM-resident table executes one update
    per index (~190 ns on v5e): the grid-800 flagship train step spent
    63% of its device time in ONE such scatter (train_trace_800b +
    train_hlo_800 attribution). This formulation sorts the indices
    once, permutes the update columns into sorted order (a channels-
    first column gather — the fast gather orientation), and lax.scans
    over M-sample tiles: each tile becomes a [C4, M] x [M, K] one-hot
    matmul on the MXU, accumulated into a K-column lane-aligned window
    of the table via dynamic-update-slice (consecutive windows are
    non-decreasing, and the scan is sequential, so overlaps are safe).
    A tile whose sorted span exceeds the window falls back to a
    per-tile XLA scatter via lax.cond — exact at any index density.
    HW probe (scatter_probe.log): 102 ms -> ~19 ms including sort +
    permute at the grid-800 backward shape ([64, 1016064], N=524288).
    """
    C4, N = rows_cf.shape
    M = _FAST_SCATTER_M
    K = _FAST_SCATTER_K
    pad = (-N) % M
    if pad:
        # dump slot R: padded columns land in [R, R+K) and are sliced off
        idx = jnp.concatenate(
            [idx, jnp.full((pad,), R, jnp.int32)])
        rows_cf = jnp.concatenate(
            [rows_cf, jnp.zeros((C4, pad), rows_cf.dtype)], 1)
    n = N + pad
    sk, perm = jax.lax.sort_key_val(
        idx.astype(jnp.int32), jnp.arange(n, dtype=jnp.int32))
    sg = rows_cf[:, perm]
    kar = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    def body(tab, t):
        rows = jax.lax.dynamic_slice(sk, (t * M,), (M,))
        base = rows[0]
        base_al = base - base % 128
        gt = jax.lax.dynamic_slice(sg, (0, t * M), (C4, M))
        ok = rows[M - 1] - base_al < K

        def fast(tab):
            oh = (rows[None, :] == base_al + kar).astype(jnp.float32)
            # HIGHEST precision is load-bearing: the TPU default runs
            # f32 matmuls as single-pass bf16, truncating every
            # gradient to 8 mantissa bits (|dgrid| 1.36e-2 vs the
            # exact scatter on HW — verify_r5_drive round 5). The
            # one-hot factor is exact in any dtype, so multi-pass
            # reconstruction of gt makes the sum f32-exact.
            w = jax.lax.dot_general(
                gt, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # [C4, K]
            win = jax.lax.dynamic_slice(tab, (0, base_al), (C4, K))
            return jax.lax.dynamic_update_slice(
                tab, win + w, (0, base_al))

        def slow(tab):
            return tab.at[:, rows].add(gt)

        return jax.lax.cond(ok, fast, slow, tab), None

    tab0 = jnp.zeros((C4, R + K + 128), jnp.float32)
    tab, _ = jax.lax.scan(
        body, tab0, jnp.arange(n // M, dtype=jnp.int32))
    return tab[:, :R]


def _use_fast_scatter(c4, r, n):
    return (os.environ.get("HYPERREEL_FAST_SCATTER", "1")
            not in ("0", "false")
            and c4 * r * 4 > _FAST_SCATTER_MIN_TABLE_BYTES
            and n >= 4 * _FAST_SCATTER_M)


def _unnormalize(coord, size):
    """Map [-1, 1] -> [0, size-1] pixel coordinates (align_corners=True)."""
    return (coord + 1.0) * 0.5 * (size - 1)


def grid_sample_2d_cf(grid_hwc, coords):
    """Channels-first bilinear plane sampling: returns [C, N] for flat
    coords [N, 2].

    TPU-critical layout: a gather producing [N, C] with small C puts C on
    the 128-lane axis and XLA pads it 16x (observed: 16 GB for 1 GB of
    corner values at a 1M-ray render). Gathering [C, N] keeps the huge N
    axis on lanes — no padding.
    """
    H, W, C = grid_hwc.shape
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    flat_cf = grid_hwc.reshape(H * W, C).T  # [C, H*W]

    def corner(yc, xc, w):
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        idx = yi * W + xi
        # gather at table precision (bf16 tables halve gathered bytes),
        # interpolate at f32
        val = flat_cf[:, idx].astype(jnp.float32)  # [C, N]
        return val * (w * inb.astype(jnp.float32))[None, :]

    return (
        corner(y0, x0, (1.0 - wy1) * (1.0 - wx1))
        + corner(y0, x0 + 1.0, (1.0 - wy1) * wx1)
        + corner(y0 + 1.0, x0, wy1 * (1.0 - wx1))
        + corner(y0 + 1.0, x0 + 1.0, wy1 * wx1)
    )


def grid_sample_2d_cf_packed(grid_hwc, coords):
    """Word-packed channels-first bilinear sampling for bf16 tables.

    TPU gathers move ~one 32-bit lane element per cycle per lane, so the
    gather cost scales with gathered WORDS. Packing two bf16 channels per
    uint32 word halves it. Input grid [H, W, C] bf16 with C even; returns
    f32 [C//2, N, 2] — word-major channel pairs (channel c lives at
    [c//2, :, c%2]); consumers contract in that layout (no relayout of the
    huge N axis).
    """
    import jax
    H, W, C = grid_hwc.shape
    assert C % 2 == 0 and grid_hwc.dtype == jnp.bfloat16
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    words = jax.lax.bitcast_convert_type(
        grid_hwc.reshape(H * W, C // 2, 2), jnp.uint32)  # [HW, C//2]
    flat_cf = words.T  # [C//2, HW]

    def corner(yc, xc, w):
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        idx = yi * W + xi
        vals_u32 = flat_cf[:, idx]                          # [C//2, N]
        vals = jax.lax.bitcast_convert_type(
            vals_u32, jnp.bfloat16).astype(jnp.float32)     # [C//2, N, 2]
        return vals * (w * inb.astype(jnp.float32))[None, :, None]

    return (
        corner(y0, x0, (1.0 - wy1) * (1.0 - wx1))
        + corner(y0, x0 + 1.0, (1.0 - wy1) * wx1)
        + corner(y0 + 1.0, x0, wy1 * (1.0 - wx1))
        + corner(y0 + 1.0, x0 + 1.0, wy1 * wx1)
    )


def _cf_to_packed_layout(out_cf):
    """[C, N] -> [C//2, N, 2] word-major channel pairs."""
    C, N = out_cf.shape
    return jnp.moveaxis(out_cf.reshape(C // 2, 2, N), 1, 2)


def grid_sample_2d_cf_quad(grid_hwc, coords):
    """Differentiable wrapper around the quad-corner gather: the forward is
    the bf16 one-gather kernel; the backward routes through the plain f32
    sampler (the bitcast word packing has no gradient rule, and scatter
    precision is better in f32 anyway)."""
    return _quad2d_vjp(grid_hwc, coords)


@jax.custom_vjp
def _quad2d_vjp(grid_hwc, coords):
    return _grid_sample_2d_cf_quad_impl(grid_hwc, coords)


def _quad2d_ref(grid_hwc, coords):
    return _cf_to_packed_layout(grid_sample_2d_cf(grid_hwc, coords))


def _quad2d_fwd(grid_hwc, coords):
    out, q = _grid_sample_2d_cf_quad_impl(grid_hwc, coords, with_q=True)
    # residual q: the forward's gathered corner rows, stored at table
    # dtype (lossless — they came FROM the table). The backward reads
    # them instead of RE-gathering: the re-gather was the second
    # 147 ms/8-step fusion of the grid-800 train step, and the
    # residual round-trip is ~0.3 ms of HBM traffic (quadbwd.log:
    # full quad grad 373 -> 50 ms at the train shape, coord-grad
    # parity EXACT for this elementwise-sum contraction).
    return out, (grid_hwc, coords, q)


def _quad2d_bwd(res, g):
    """Packed-scatter backward: ONE channels-first scatter into the padded
    quad table followed by a dense shift-and-add fold, instead of four
    corner scatters (scatters are row-rate-bound like gathers). The coords
    gradient reuses the forward's gathered corner rows (residual q) —
    no re-gather. Verified against jax.vjp of the unpacked reference
    sampler (tests/test_packed_tables.py)."""
    grid_hwc, coords, q = res
    H, W, C = grid_hwc.shape
    N = coords.shape[0]

    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
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

    i00 = inb(y0, x0)
    i01 = inb(y0, x0 + 1.0)
    i10 = inb(y0 + 1.0, x0)
    i11 = inb(y0 + 1.0, x0 + 1.0)
    w00 = (1.0 - wy1) * (1.0 - wx1) * i00
    w01 = (1.0 - wy1) * wx1 * i01
    w10 = wy1 * (1.0 - wx1) * i10
    w11 = wy1 * wx1 * i11

    # cotangent to flat channel order [C, N] (channel c at [c//2, :, c%2])
    g_cf = jnp.moveaxis(g, 2, 1).reshape(C, N)

    # ---- grid gradient: one scatter into the padded quad-table layout
    g_rows = jnp.concatenate(
        [g_cf * w00[None], g_cf * w01[None],
         g_cf * w10[None], g_cf * w11[None]], 0)  # [4C, N] corner-major
    R = (H + 1) * (W + 1)
    if _use_fast_scatter(4 * C, R, N):
        # sorted window-matmul scatter (round-5): the plain XLA
        # scatter-add was 63% of the final-scale train step
        pack_g = _scatter_add_cf_cols(idx, g_rows, R)
    else:
        pack_g = jnp.zeros((4 * C, R), jnp.float32).at[:, idx].add(
            g_rows)
    pg = pack_g.reshape(4, C, H + 1, W + 1)
    # pack[Y, X, corner k] reads plane_padded[Y+dy_k, X+dx_k]; transpose:
    # plane_grad[y, x] = sum_k pg[k, :, y+1-dy_k, x+1-dx_k]
    g_plane = (pg[0, :, 1:H + 1, 1:W + 1]
               + pg[1, :, 1:H + 1, 0:W]
               + pg[2, :, 0:H, 1:W + 1]
               + pg[3, :, 0:H, 0:W])
    g_grid = jnp.moveaxis(g_plane, 0, -1).astype(grid_hwc.dtype)

    # ---- coords gradient from the RESIDUAL corner rows (no re-gather).
    # Contraction stays N-major end to end (q is the gather's native row
    # order; g transposes [C//2, N, 2] -> [N, C//2, 2] with the minor
    # dim intact — NOT the catastrophic minor-dim transpose). The
    # elementwise-sum form is grad-EXACT vs the re-gather path; a
    # batch-N dot_general is NOT (bf16 single-pass truncation, 2e-3 —
    # quadbwd.log).
    g_nm = jnp.moveaxis(g, 1, 0)                      # [N, C//2, 2]
    s = jnp.sum(q.astype(jnp.float32) * g_nm[:, None],
                axis=(2, 3))                          # [N, 4]
    s00 = s[:, 0] * i00
    s01 = s[:, 1] * i01
    s10 = s[:, 2] * i10
    s11 = s[:, 3] * i11
    dwx = (-(1.0 - wy1) * s00 + (1.0 - wy1) * s01
           - wy1 * s10 + wy1 * s11)
    dwy = (-(1.0 - wx1) * s00 - wx1 * s01
           + (1.0 - wx1) * s10 + wx1 * s11)
    g_coords = jnp.stack(
        [dwx * 0.5 * (W - 1), dwy * 0.5 * (H - 1)], -1)
    return g_grid, g_coords


_quad2d_vjp.defvjp(_quad2d_fwd, _quad2d_bwd)


def grid_sample_1d_cf_quad(line_lc, coords):
    """Differentiable wrapper for the 1D quad gather (see 2D variant)."""
    return _quad1d_vjp(line_lc, coords)


@jax.custom_vjp
def _quad1d_vjp(line_lc, coords):
    return _grid_sample_1d_cf_quad_impl(line_lc, coords)


def _quad1d_ref(line_lc, coords):
    return _cf_to_packed_layout(grid_sample_1d_cf(line_lc, coords))


def _quad1d_fwd(line_lc, coords):
    out, q = _grid_sample_1d_cf_quad_impl(line_lc, coords, with_q=True)
    return out, (line_lc, coords, q)


def _quad1d_bwd(res, g):
    """1D analog of _quad2d_bwd: one packed scatter into [2C, L+1] +
    shift-add fold for the line gradient (the line table is small
    enough to stay VMEM-resident, so the plain XLA scatter is fine);
    coord gradient from the residual neighbor rows — the previous
    jax.vjp(reference-sampler) route re-ran TWO corner gathers and
    four corner scatters per line."""
    line_lc, coords, q = res
    L, C = line_lc.shape
    N = coords.shape[0]
    z = _unnormalize(coords, L)
    z0 = jnp.floor(z)
    wz1 = z - z0
    zi = (jnp.clip(z0, -1, L - 1) + 1).astype(jnp.int32)
    in0 = ((z0 >= 0.0) & (z0 <= L - 1.0)).astype(jnp.float32)
    in1 = ((z0 + 1.0 >= 0.0) & (z0 + 1.0 <= L - 1.0)).astype(
        jnp.float32)
    w0 = (1.0 - wz1) * in0
    w1 = wz1 * in1

    g_cf = jnp.moveaxis(g, 2, 1).reshape(C, N)
    g_rows = jnp.concatenate([g_cf * w0[None], g_cf * w1[None]], 0)
    pack_g = jnp.zeros((2 * C, L + 1), jnp.float32).at[:, zi].add(
        g_rows)
    pg = pack_g.reshape(2, C, L + 1)
    # pack[zp] = (p[zp], p[zp+1]) over the 1-padded line: neighbor 0 at
    # pack row zp reads line[zp-1], neighbor 1 reads line[zp]
    g_line = pg[0, :, 1:L + 1] + pg[1, :, 0:L]
    g_line = jnp.moveaxis(g_line, 0, -1).astype(line_lc.dtype)

    g_nm = jnp.moveaxis(g, 1, 0)                      # [N, C//2, 2]
    s = jnp.sum(q.astype(jnp.float32) * g_nm[:, None],
                axis=(2, 3))                          # [N, 2]
    dwz = -s[:, 0] * in0 + s[:, 1] * in1
    return g_line, dwz * 0.5 * (L - 1)


_quad1d_vjp.defvjp(_quad1d_fwd, _quad1d_bwd)


def _grid_sample_2d_cf_quad_impl(grid_hwc, coords, with_q=False):
    """One-gather bilinear sampling: the table stores each texel's 2x2
    neighborhood, so a single gathered row carries all four corners.

    with_q=True additionally returns the gathered corner rows q
    ([N, 4, C//2, 2] at table dtype — lossless) for VJP residual reuse.

    Device traces show TPU gather fusions cost ~constant time per gathered
    ROW (3.77 ms for 2.1M rows on v5e regardless of 32 B vs 64 B rows), so
    folding the 4 bilinear corners into one row is a ~4x cut in gather time
    versus 4 corner gathers.

    Table build (cheap, per call): zero-pad the plane by one texel ring,
    pack[y, x] = (p[y,x], p[y,x+1], p[y+1,x], p[y+1,x+1]) for base indices
    clamped to [-1, dim-1]+1 — out-of-range corners read the zero ring,
    matching torch zero-padding; far out-of-range corners are zeroed by the
    per-corner in-bounds weight masks.

    grid [H, W, C] (bf16 or f32), C even; coords [N, 2] -> f32
    [C//2, N, 2] (word-major channel pairs, same layout as
    grid_sample_2d_cf_packed). bf16 tables gather 32 B rows; f32 tables
    gather 64 B rows at full precision — gather time is per-row, so both
    cost the same (PERFORMANCE.md).
    """
    H, W, C = grid_hwc.shape
    assert C % 2 == 0
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    p = jnp.pad(grid_hwc, ((1, 1), (1, 1), (0, 0)))
    pack = jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], -1
    )  # [H+1, W+1, 4C]
    R = (H + 1) * (W + 1)
    xi = (jnp.clip(x0, -1, W - 1) + 1).astype(jnp.int32)
    yi = (jnp.clip(y0, -1, H - 1) + 1).astype(jnp.int32)
    idx = yi * (W + 1) + xi

    def wmask(yc, xc, w):
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        return w * inb.astype(jnp.float32)

    # Corner reduction happens in the gather's native row layout BEFORE any
    # layout change: the old channels-first-first ordering cost two
    # u32[2C, N] transpose copies (7.6 ms each) plus 2.1 GB unpacked-corner
    # temps per plane at a 262144-ray chunk. The stack+sum form fuses into
    # ONE kInput reduction (2.5 ms); writing it as four adds re-materializes
    # the unpacked corners (2.1 GB each, +9 ms) — keep the stack.
    w4 = jnp.stack(
        [wmask(y0, x0, (1.0 - wy1) * (1.0 - wx1)),
         wmask(y0, x0 + 1.0, (1.0 - wy1) * wx1),
         wmask(y0 + 1.0, x0, wy1 * (1.0 - wx1)),
         wmask(y0 + 1.0, x0 + 1.0, wy1 * wx1)], -1)
    N = idx.shape[0]
    if grid_hwc.dtype == jnp.bfloat16:
        words = jax.lax.bitcast_convert_type(
            pack.reshape(R, 2 * C, 2), jnp.uint32)       # [R, 2C]
        rows = words[idx]                                # [N, 2C] gather
        q = jax.lax.bitcast_convert_type(
            rows.reshape(N, 4, C // 2), jnp.bfloat16
        ).astype(jnp.float32)                            # [N, 4, C//2, 2]
    else:
        rows = pack.reshape(R, 4 * C)[idx]               # [N, 4C] gather
        q = rows.reshape(N, 4, C // 2, 2)
    out_row = jnp.sum(q * w4[:, :, None, None], axis=1)  # [N, C//2, 2]
    out = jnp.moveaxis(out_row, 0, 1)                    # [C//2, N, 2]
    if with_q:
        return out, q.astype(grid_hwc.dtype)
    return out


def _grid_sample_1d_cf_quad_impl(line_lc, coords, with_q=False):
    """One-gather linear line sampling: rows carry both neighbors.
    line [L, C] (bf16 or f32), C even; coords [N] -> f32 [C//2, N, 2].
    with_q=True additionally returns the gathered neighbor rows q
    ([N, 2, C//2, 2] at table dtype) for VJP residual reuse."""
    L, C = line_lc.shape
    assert C % 2 == 0
    z = _unnormalize(coords, L)
    z0 = jnp.floor(z)
    wz1 = z - z0

    p = jnp.pad(line_lc, ((1, 1), (0, 0)))
    pack = jnp.concatenate([p[:-1], p[1:]], -1)  # [L+1, 2C]
    zi = (jnp.clip(z0, -1, L - 1) + 1).astype(jnp.int32)

    def wmask(zc, w):
        inb = (zc >= 0) & (zc <= L - 1)
        return w * inb.astype(jnp.float32)

    # row-layout corner reduction (see 2D variant for the rationale)
    w2 = jnp.stack([wmask(z0, 1.0 - wz1), wmask(z0 + 1.0, wz1)], -1)
    N = zi.shape[0]
    if line_lc.dtype == jnp.bfloat16:
        words = jax.lax.bitcast_convert_type(
            pack.reshape(L + 1, C, 2), jnp.uint32)       # [L+1, C]
        rows = words[zi]                                 # [N, C] gather
        q = jax.lax.bitcast_convert_type(
            rows.reshape(N, 2, C // 2), jnp.bfloat16
        ).astype(jnp.float32)                            # [N, 2, C//2, 2]
    else:
        rows = pack[zi]                                  # [N, 2C] gather
        q = rows.reshape(N, 2, C // 2, 2)
    out_row = jnp.sum(q * w2[:, :, None, None], axis=1)  # [N, C//2, 2]
    out = jnp.moveaxis(out_row, 0, 1)                    # [C//2, N, 2]
    if with_q:
        return out, q.astype(line_lc.dtype)
    return out


def grid_sample_1d_cf_packed(line_lc, coords):
    """Word-packed 1D variant: line [L, C] bf16, C even -> f32 [C//2, N, 2]."""
    import jax
    L, C = line_lc.shape
    assert C % 2 == 0 and line_lc.dtype == jnp.bfloat16
    z = _unnormalize(coords, L)
    z0 = jnp.floor(z)
    wz1 = z - z0
    words = jax.lax.bitcast_convert_type(
        line_lc.reshape(L, C // 2, 2), jnp.uint32)
    flat_cf = words.T  # [C//2, L]

    def corner(zc, w):
        inb = (zc >= 0) & (zc <= L - 1)
        zi = jnp.clip(zc, 0, L - 1).astype(jnp.int32)
        vals = jax.lax.bitcast_convert_type(
            flat_cf[:, zi], jnp.bfloat16).astype(jnp.float32)
        return vals * (w * inb.astype(jnp.float32))[None, :, None]

    return corner(z0, 1.0 - wz1) + corner(z0 + 1.0, wz1)


def grid_sample_1d_cf(line_lc, coords):
    """Channels-first linear line sampling: [C, N] for flat coords [N]."""
    L, C = line_lc.shape
    z = _unnormalize(coords, L)
    z0 = jnp.floor(z)
    wz1 = z - z0
    flat_cf = line_lc.T  # [C, L]

    def corner(zc, w):
        inb = (zc >= 0) & (zc <= L - 1)
        zi = jnp.clip(zc, 0, L - 1).astype(jnp.int32)
        return flat_cf[:, zi].astype(jnp.float32) * (
            w * inb.astype(jnp.float32))[None, :]

    return corner(z0, 1.0 - wz1) + corner(z0 + 1.0, wz1)


def grid_sample_2d(grid_hwc, coords):
    """Sample a 2D grid bilinearly.

    Args:
      grid_hwc: [H, W, C] feature plane.
      coords:   [..., 2] normalized coords in [-1, 1]; coords[..., 0] indexes
                the W (x) axis and coords[..., 1] the H (y) axis, matching
                torch.nn.functional.grid_sample's grid convention.

    Returns:
      [..., C] sampled features; out-of-range corners contribute zeros.
    """
    H, W, C = grid_hwc.shape
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def corner(yc, xc, wy, wx):
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        val = grid_hwc[yi, xi]  # [..., C]
        w = (wy * wx) * inb.astype(grid_hwc.dtype)
        return val * w[..., None]

    out = (
        corner(y0, x0, wy0, wx0)
        + corner(y0, x1, wy0, wx1)
        + corner(y1, x0, wy1, wx0)
        + corner(y1, x1, wy1, wx1)
    )
    return out


def grid_sample_1d(line_lc, coords):
    """Sample a 1D line bilinearly (reference uses a [1, C, L, 1] plane with a
    zero x-coordinate — equivalent to pure 1D interpolation along L).

    Args:
      line_lc: [L, C] feature line.
      coords:  [...] normalized coords in [-1, 1] indexing the L axis.

    Returns:
      [..., C]
    """
    L, C = line_lc.shape
    z = _unnormalize(coords, L)
    z0 = jnp.floor(z)
    z1 = z0 + 1.0
    wz1 = z - z0
    wz0 = 1.0 - wz1

    def corner(zc, w):
        inb = (zc >= 0) & (zc <= L - 1)
        zi = jnp.clip(zc, 0, L - 1).astype(jnp.int32)
        return line_lc[zi] * (w * inb.astype(line_lc.dtype))[..., None]

    return corner(z0, wz0) + corner(z1, wz1)


def grid_sample_3d(vol_dhwc, coords):
    """Trilinear sampling of a 3D volume (used by the alpha-grid occupancy
    mask, reference utils/tensorf_utils.py:459-484).

    Args:
      vol_dhwc: [D, H, W, C] volume.
      coords:   [..., 3]; coords[..., 0] indexes W, [..., 1] H, [..., 2] D
                (torch grid_sample 3D convention).

    Returns:
      [..., C]
    """
    D, H, W, C = vol_dhwc.shape
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    z = _unnormalize(coords[..., 2], D)

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)

    out = jnp.zeros(coords.shape[:-1] + (C,), vol_dhwc.dtype)
    for dz in (0.0, 1.0):
        for dy in (0.0, 1.0):
            for dx in (0.0, 1.0):
                xc, yc, zc = x0 + dx, y0 + dy, z0 + dz
                wx = 1.0 - jnp.abs(x - xc)
                wy = 1.0 - jnp.abs(y - yc)
                wz = 1.0 - jnp.abs(z - zc)
                inb = (
                    (xc >= 0) & (xc <= W - 1)
                    & (yc >= 0) & (yc <= H - 1)
                    & (zc >= 0) & (zc <= D - 1)
                )
                xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
                yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
                zi = jnp.clip(zc, 0, D - 1).astype(jnp.int32)
                val = vol_dhwc[zi, yi, xi]
                w = (wx * wy * wz) * inb.astype(vol_dhwc.dtype)
                out = out + val * w[..., None]
    return out


def resize_bilinear_2d(grid_hwc, new_h, new_w):
    """Bilinear resize with align_corners=True (torch F.interpolate
    equivalent; used for volume-grid upsampling,
    reference nlf/nets/tensorf_base.py:1151-1188)."""
    H, W, _ = grid_hwc.shape
    ys = jnp.linspace(-1.0, 1.0, new_h) if new_h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(-1.0, 1.0, new_w) if new_w > 1 else jnp.zeros((1,))
    # Guard degenerate source axes (align_corners maps everything to pixel 0).
    if H == 1:
        ys = jnp.full((new_h,), -1.0)
    if W == 1:
        xs = jnp.full((new_w,), -1.0)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([gx, gy], -1)
    return grid_sample_2d(grid_hwc, coords)


def resize_linear_1d(line_lc, new_l):
    """1D align_corners=True resize for line factors."""
    L, _ = line_lc.shape
    zs = jnp.linspace(-1.0, 1.0, new_l) if new_l > 1 else jnp.zeros((1,))
    if L == 1:
        zs = jnp.full((new_l,), -1.0)
    return grid_sample_1d(line_lc, zs)


def grid_sample_2d_cf_quad_int8(grid_hwc, coords):
    """Eval-only int8 quad sampling: quantize the plane per-channel to
    int8 (absmax/127), pack the 2x2 quad neighborhood FOUR channels per
    u32 word (vs two bf16 channels), gather, and dequantize in-fusion.

    Same row COUNT as the bf16 quad gather (gather cost is per-row), but
    the gathered words halve — the mandatory u32 relayout copy and the
    unpack fusions shrink 2x. Not differentiable; intended for render /
    viewer paths (net cfg table_dtype="int8").
    """
    H, W, C = grid_hwc.shape
    assert C % 4 == 0, "int8 packing needs C % 4 == 0"
    g32 = grid_hwc.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(g32), axis=(0, 1)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(g32 / scale), -127, 127).astype(jnp.int8)

    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    p = jnp.pad(q, ((1, 1), (1, 1), (0, 0)))
    pack = jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], -1
    )  # [H+1, W+1, 4C] int8, corner-major channel blocks
    R = (H + 1) * (W + 1)
    xi = (jnp.clip(x0, -1, W - 1) + 1).astype(jnp.int32)
    yi = (jnp.clip(y0, -1, H - 1) + 1).astype(jnp.int32)
    idx = yi * (W + 1) + xi

    def wmask(yc, xc, w):
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        return w * inb.astype(jnp.float32)

    w4 = jnp.stack(
        [wmask(y0, x0, (1.0 - wy1) * (1.0 - wx1)),
         wmask(y0, x0 + 1.0, (1.0 - wy1) * wx1),
         wmask(y0 + 1.0, x0, wy1 * (1.0 - wx1)),
         wmask(y0 + 1.0, x0 + 1.0, wy1 * wx1)], -1)

    N = idx.shape[0]
    words = jax.lax.bitcast_convert_type(
        pack.reshape(R, C, 4), jnp.uint32)               # [R, C] words
    rows = words[idx]                                    # [N, C] gather
    qv = jax.lax.bitcast_convert_type(
        rows.reshape(N, 4, C // 4), jnp.int8
    ).astype(jnp.float32)                                # [N, 4, C//4, 4]
    out = jnp.sum(qv * w4[:, :, None, None], axis=1)     # [N, C//4, 4]
    out = out * scale.reshape(C // 4, 4)[None]
    out_row = out.reshape(N, C // 2, 2)
    return jnp.moveaxis(out_row, 0, 1)                   # [C//2, N, 2]


def grid_sample_1d_cf_quad_int8(line_lc, coords):
    """Eval-only int8 line sampling (see 2D variant)."""
    L, C = line_lc.shape
    assert C % 4 == 0
    g32 = line_lc.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(g32), axis=0), 1e-12) / 127.0
    q = jnp.clip(jnp.round(g32 / scale), -127, 127).astype(jnp.int8)

    z = _unnormalize(coords, L)
    z0 = jnp.floor(z)
    wz1 = z - z0
    p = jnp.pad(q, ((1, 1), (0, 0)))
    pack = jnp.concatenate([p[:-1], p[1:]], -1)  # [L+1, 2C] int8
    zi = (jnp.clip(z0, -1, L - 1) + 1).astype(jnp.int32)

    def wmask(zc, w):
        inb = (zc >= 0) & (zc <= L - 1)
        return w * inb.astype(jnp.float32)

    w2 = jnp.stack([wmask(z0, 1.0 - wz1), wmask(z0 + 1.0, wz1)], -1)
    N = zi.shape[0]
    words = jax.lax.bitcast_convert_type(
        pack.reshape(L + 1, C // 2, 4), jnp.uint32)      # [L+1, C//2]
    rows = words[zi]                                     # [N, C//2] gather
    qv = jax.lax.bitcast_convert_type(
        rows.reshape(N, 2, C // 4), jnp.int8
    ).astype(jnp.float32)                                # [N, 2, C//4, 4]
    out = jnp.sum(qv * w2[:, :, None, None], axis=1)     # [N, C//4, 4]
    out = out * scale.reshape(C // 4, 4)[None]
    out_row = out.reshape(N, C // 2, 2)
    return jnp.moveaxis(out_row, 0, 1)                   # [C//2, N, 2]
