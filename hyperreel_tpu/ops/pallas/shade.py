"""Fused Pallas render core for the dynamic HyperReel color net
(TensorVMKeyframeTime, reference nlf/nets/tensorf_dynamic.py:287-371 +
SH shading utils/sh_utils.py + composite utils/tensorf_utils.py:242-253).

One kernel consumes the XLA space-plane quad-row gather output and does
everything downstream on-chip: space bilinear corner-reduce, the
time-plane lookup as a VMEM-resident "four-hot" MXU matmul (A[r, n] =
sum_k w_k[n] * (r == base_k[n]); table^T @ A = bilinear time features),
space*time product, basis matmul, SH shading, per-sample color
scale/shift, and the per-ray log-transmittance composite as a SEGMENTED
lane-space scan.

Layout rules measured on v5e Mosaic (experiments/exp_pallas_probe*.py +
PERFORMANCE.md round-2 notes):
  * the kernel interior is CHANNELS-FIRST ([C, blk], samples on lanes) —
    a first sample-on-sublanes version ran 5x slower than the XLA chain
    because [N, 1]/[N, 16] column math uses 1/8..1/16 of the VPU lanes;
  * per-sample scalars ship as ONE [24, N] channels-first pack (dense in
    HBM; lane-padded [N, k<128] arrays cost 4.3 GB at 8.4M samples, and
    (1, blk) block shapes don't lower — blocks need (8k, 128m) shapes);
  * SH basis rows are computed channels-first in XLA (stack of [N]
    elementwise rows — no transpose) and ride in the pack;
  * the gathered rows block is transposed to [4C, blk] in-kernel (2D
    transposes lower fine; multi-dim reshapes don't).

Eval-only (no VJP); training keeps the packed-scatter XLA path.

Scalar pack row layout (build_scalar_pack):
  0 xn  1 yn  (space plane coords, [-1, 1])
  2 zn  3 tn  (time plane coords)
  4 dist (sorted ray distance)
  5..7  color_scale rgb   8..10 color_shift rgb
  11..13 viewdir xyz      14..15 zero pad
Validity (coords inside the aabb and dist > 0) and the SH basis rows are
computed IN-KERNEL from these — shipping 16 rows instead of 24 cuts the
pack's HBM traffic by a third (~270 MB/call at 8.4M samples).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperreel_tpu.ops.sh import C0, C1, C2, C3, C4

_LOG_EPS = -23.025850929940457
_EXP_CLAMP = 70.0
PACK_ROWS = 16


def kmajor_perm(rows3k):
    """Row permutation [3K] -> K-MAJOR (new row i = old row
    (i%3)*K + i//3): _shade_tail reads each basis coefficient's three
    channels as ONE contiguous [3, blk] slice instead of 3K single-row
    sublane extracts + [1, blk] FMAs at 1/8 vreg utilization (the tail
    was the kernel's largest stage, 1.39 ms/chunk of fn.1 4.52 —
    shade_breakdown2b.log). Apply to wb_t rows at trace time; bit-exact
    (per-channel accumulation order unchanged)."""
    K = rows3k // 3
    i = np.arange(rows3k)
    return (i % 3) * K + i // 3


def _sh_basis_rows(deg, x, y, z):
    """SH basis values on channels-first [1, blk] rows (mirrors
    ops/sh.py eval_sh_bases, reference utils/sh_utils.py:41-141)."""
    out = [jnp.full_like(x, C0)]
    if deg > 0:
        out += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            out += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                    C2[3] * xz, C2[4] * (xx - yy)]
            if deg > 2:
                out += [
                    C3[0] * y * (3.0 * xx - yy),
                    C3[1] * xy * z,
                    C3[2] * y * (4.0 * zz - xx - yy),
                    C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                    C3[4] * x * (4.0 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3.0 * yy),
                ]
                if deg > 3:
                    out += [
                        C4[0] * xy * (xx - yy),
                        C4[1] * yz * (3.0 * xx - yy),
                        C4[2] * xy * (7.0 * zz - 1.0),
                        C4[3] * yz * (7.0 * zz - 3.0),
                        C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
                        C4[5] * xz * (7.0 * zz - 3.0),
                        C4[6] * (xx - yy) * (7.0 * zz - 1.0),
                        C4[7] * xz * (xx - 3.0 * yy),
                        C4[8] * (xx * (xx - 3.0 * yy)
                                 - yy * (3.0 * xx - yy)),
                    ]
    return out


def _twohot_matmul(ttab_ref, zb, w0, w1, Rt, blk, acc_dtype, out_rows,
                   rt_real=None, pzp=None):
    """zfeat = ttab @ two_hot(zb), built in <=128-ROW STRIPS: the full
    [Rt, blk] f32 two-hot was the largest in-kernel temporary and drove
    Mosaic VMEM exhaustion at tile=128 multi-axis blocks
    (exp_multiaxis_tile.py); per-strip peak is [128, blk]. Masks stay
    in the 32-bit domain — bf16 `where` operands force an i1 mask
    relayout "(8,128) -> (16,128)" that this Mosaic version rejects.

    rt_real: the REAL two-hot support (table width before the lane-dim
    pad to 128), rounded up to the sublane multiple of 8. The strip
    build is the kernel's dominant VPU term, and at the flagship's
    premixed z width (TW+2 = 82 -> 88) trimming the strip to 88 rows
    cuts ~31% of it; zb+1 <= TW < rt_real so the trimmed rows are
    always zero.

    pzp: the continuous RING-SHIFTED coord (pz + 1). When given, the
    strip is built as the HAT function max(0, 1 - |r - pzp|) — sub /
    abs / rsub / max per element instead of iota-compare + 2 selects.
    BIT-IDENTICAL to the masked two-hot for ring-padded tables: in the
    support the weights equal 1-frac / frac exactly (all three
    subtractions are exact in f32 at these magnitudes), at the edges
    the hat puts weight on the table's ZERO ring columns (same zero
    contribution the in_lo/in_hi masks produced), and out of range all
    weights clamp to 0."""
    lim = Rt if rt_real is None else min(rt_real, Rt)
    zfeat = jnp.zeros((out_rows, blk), jnp.float32)
    for r0 in range(0, lim, 128):
        h = min(128, lim - r0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (h, blk), 0) + r0
        if pzp is not None:
            dist_r = jnp.abs(iota.astype(jnp.float32) - pzp)
            strip = jnp.maximum(0.0, 1.0 - dist_r)
        else:
            strip = (jnp.where(iota == zb, w0, 0.0)
                     + jnp.where(iota == zb + 1, w1, 0.0))
        zfeat = zfeat + jax.lax.dot_general(
            ttab_ref[:, r0:r0 + h].astype(acc_dtype),
            strip.astype(acc_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return zfeat


def _corner_weights(p, lim):
    """Pixel coord [1, blk] -> (base index, frac, lo/hi in-bounds masks);
    matches the quad-table indexing (ops/grid_sample.py:269-283)."""
    p0 = jnp.floor(p)
    frac = p - p0
    base = (jnp.clip(p0, -1.0, lim - 1.0) + 1.0).astype(jnp.int32)
    in_lo = ((p0 >= 0.0) & (p0 <= lim - 1.0)).astype(jnp.float32)
    in_hi = ((p0 + 1.0 >= 0.0) & (p0 + 1.0 <= lim - 1.0)).astype(
        jnp.float32)
    return base, frac, in_lo, in_hi


def _shade_core(pk, feat_s, ttab_ref, wb_ref, out_ref, row0,
                *, S, blk, TW, TH, Rt, C, n_density, n_basis, sh_deg,
                density_shift, distance_scale, acc_dtype, s_major,
                use_weights_row, shading, ablate, collect=None):
    """Everything downstream of the space features: validity, the
    separable time-plane blend, density, the basis matmul, and the
    shade/composite tail. Writes out_ref rows [row0, row0+8)."""
    xn = pk[0:1]
    yn = pk[1:2]
    zn = pk[2:3]
    tn = pk[3:4]
    dist = pk[4:5]

    # validity in-kernel: coords inside the aabb (|normalized| <= 1,
    # matching valid_mask on the pre-normalized points) and dist > 0
    valid = ((jnp.abs(xn) <= 1.0) & (jnp.abs(yn) <= 1.0)
             & (jnp.abs(zn) <= 1.0) & (dist > 0.0)).astype(jnp.float32)

    # ---- time-plane bilinear, SEPARABLE: a z-axis two-hot MXU matmul
    # fetches the z-interpolated features of EVERY keyframe row at once,
    # then the (few) keyframe rows mix with per-sample t weights. The
    # earlier joint four-hot built a [Rt=(TH+2)(TW+2), blk] one-hot —
    # ~12 VPU ops over 4x more rows dominated the kernel.
    if "time" in ablate:
        prod = feat_s
    else:
        pz = (zn + 1.0) * 0.5 * (TW - 1)
        zb, fz, z_lo, z_hi = _corner_weights(pz, TW)

        if "amm" in ablate:
            zfeat = jnp.broadcast_to(
                fz * 0.5, (((TH + 2) * C if TH else C), blk)) + 0.25
        else:
            # TH == 0: UNIFORM-TIME PREMIX (round 5) — the caller
            # already mixed the keyframe rows with the frame's shared
            # t weights (fused_eval uniform_time), so the two-hot
            # fetches C rows instead of (TH+2)*C: (TH+2)x fewer MXU
            # FLOPs in the kernel's dominant matmul.
            zfeat = _twohot_matmul(ttab_ref, zb, (1.0 - fz) * z_lo,
                                   fz * z_hi, Rt, blk, acc_dtype,
                                   (TH + 2) * C if TH else C,
                                   rt_real=-(-(TW + 2) // 8) * 8,
                                   pzp=pz + 1.0)
        if TH == 0 or "tmix" in ablate:
            feat_t = zfeat[:C]
        else:
            pt = (tn + 1.0) * 0.5 * (TH - 1)
            tb, ft, t_lo, t_hi = _corner_weights(pt, TH)
            t0w = (1.0 - ft) * t_lo
            t1w = ft * t_hi
            feat_t = jnp.zeros_like(feat_s)
            for k in range(TH + 2):
                mk = (jnp.where(tb == k, t0w, 0.0)
                      + jnp.where(tb == k - 1, t1w, 0.0))   # [1, blk]
                feat_t = feat_t + zfeat[k * C:(k + 1) * C] * mk

        prod = feat_s * feat_t                             # [C, blk]

    # ---- density (fea2denseAct relu); the static NoSample net
    # multiplies the density feature by the predicted per-sample weights
    # BEFORE the activation (reference tensorf_no_sample.py:184-192) —
    # those ride in pack row 14 when use_weights_row is set
    dfeat = jnp.sum(prod[:n_density], 0, keepdims=True)
    if use_weights_row:
        dfeat = dfeat * pk[14:15]
    sigma = jnp.maximum(dfeat + density_shift, 0.0)
    sigma = sigma * valid                                  # [1, blk]

    # ---- appearance: basis matmul + shared shade/composite tail
    app = jax.lax.dot_general(
        wb_ref[:], prod, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [3K, blk]
    _shade_tail(out_ref, pk, sigma, app, dist, S=S, blk=blk,
                n_basis=n_basis, sh_deg=sh_deg, shading=shading,
                distance_scale=distance_scale, s_major=s_major,
                ablate=ablate, row0=row0, collect=collect)


def _shade_kernel(rows_ref, pack_ref, ttab_ref, wb_ref, out_ref,
                  *, S, blk, W, H, TW, TH, Rt, C, n_density, n_basis,
                  sh_deg, density_shift, distance_scale, acc_dtype,
                  s_major=False, use_weights_row=False, shading="sh",
                  preblended=False, ablate=()):
    pk = pack_ref[:]                                       # [16, blk]
    xn = pk[0:1]
    yn = pk[1:2]

    # ---- space bilinear from gathered quad rows (corner-major 4 x C);
    # skipped when the patch-blend kernel already produced features
    if not preblended:
        px = (xn + 1.0) * 0.5 * (W - 1)
        py = (yn + 1.0) * 0.5 * (H - 1)
        _, fx, x_lo, x_hi = _corner_weights(px, W)
        _, fy, y_lo, y_hi = _corner_weights(py, H)
        w00 = (1.0 - fy) * (1.0 - fx) * y_lo * x_lo
        w01 = (1.0 - fy) * fx * y_lo * x_hi
        w10 = fy * (1.0 - fx) * y_hi * x_lo
        w11 = fy * fx * y_hi * x_hi

    if preblended:
        # coherent patch-gather path: rows arrive as channels-first
        # pre-blended features [C, blk] (ops/pallas/patch_blend.py)
        feat_s = rows_ref[:].astype(jnp.float32)
    elif "gatherread" in ablate:
        feat_s = jnp.full((C, blk), 0.5, jnp.float32) + xn * 0.01
    elif "blend" in ablate:
        q = rows_ref[:].astype(jnp.float32).T              # [4C, blk]
        feat_s = q[0 * C:1 * C] + w00
    else:
        q = rows_ref[:].astype(jnp.float32).T              # [4C, blk]
        feat_s = (q[0 * C:1 * C] * w00 + q[1 * C:2 * C] * w01
                  + q[2 * C:3 * C] * w10 + q[3 * C:4 * C] * w11)

    _shade_core(pk, feat_s, ttab_ref, wb_ref, out_ref, 0,
                S=S, blk=blk, TW=TW, TH=TH, Rt=Rt, C=C,
                n_density=n_density, n_basis=n_basis, sh_deg=sh_deg,
                density_shift=density_shift,
                distance_scale=distance_scale, acc_dtype=acc_dtype,
                s_major=s_major, use_weights_row=use_weights_row,
                shading=shading, ablate=ablate)


def _shade_kernel_fused_patch(*refs, S, blk, W, H, TW, TH, Rt, C,
                              px, py, m0, m1, n_density, n_basis,
                              sh_deg, density_shift, distance_scale,
                              acc_dtype, s_major, use_weights_row,
                              shading, R=4, ablate=()):
    """Fused patch-blend + shade: one invocation consumes one J-block of
    gathered patch rows and shades ALL R phases that share it (R = the
    coherent block size, 4 or 8), writing phase p's per-ray totals to
    out rows [8p, 8p+8). Replaces the separate patch-blend kernel: the
    [R*C, J] f32 feature round trip through HBM and blend's duplicate
    pack reads vanish (~3 ms/chunk of pure I/O at flagship channel
    counts, round-4b accounting). R=8 halves the patch-gather rows
    again (the per-row gather floor is flat in row bytes —
    gather_align.log) at the price of a wider patch for coverage."""
    rows_ref, anc_ref = refs[0], refs[1]
    pk_refs = refs[2:2 + R]
    ttab_ref, wb_ref, out_ref = refs[2 + R], refs[3 + R], refs[4 + R]
    # the transpose stays at TABLE dtype (bf16 — lossless); texel
    # slices cast to f32 at use. Halves the dominant fp_lane VMEM term
    # (fused_eval), which keeps tile=128 (the pack-build kernel's
    # requirement) at R=8 patch widths.
    patch = rows_ref[:].T                              # [P*C, blk]
    x0 = anc_ref[0:1]                                  # [1, blk]
    y0 = anc_ref[1:2]
    vs_list = []
    for p, pk_ref in enumerate(pk_refs):
        pk = pk_ref[:]
        # in-kernel texel scale + anchor offset (bit-identical op order
        # to the patch-blend kernel, ops/pallas/patch_blend.py)
        u = (pk[m0:m0 + 1] + 1.0) * 0.5 * (W - 1) - x0
        v = (pk[m1:m1 + 1] + 1.0) * 0.5 * (H - 1) - y0
        if "blend" in ablate:
            # timing ablation: one texel slice, no hat FMA ladder
            feat_s = patch[0:C].astype(jnp.float32) + (u + v)
        else:
            feat_s = jnp.zeros((C, blk), jnp.float32)
            for ty in range(py):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(v - ty))
                for tx in range(px):
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(u - tx))
                    t = ty * px + tx
                    feat_s = feat_s + (wx * wy) * patch[
                        t * C:(t + 1) * C].astype(jnp.float32)
        _shade_core(pk, feat_s, ttab_ref, wb_ref, out_ref, 8 * p,
                    S=S, blk=blk, TW=TW, TH=TH, Rt=Rt, C=C,
                    n_density=n_density, n_basis=n_basis, sh_deg=sh_deg,
                    density_shift=density_shift,
                    distance_scale=distance_scale, acc_dtype=acc_dtype,
                    s_major=s_major, use_weights_row=use_weights_row,
                    shading=shading, ablate=ablate, collect=vs_list)
    # ONE compaction matmul for all R phases ([8R (x2 hi/lo), blk] @
    # [blk, pt]): phase rows are independent dot products, so batching
    # is value-exact; M goes 8 -> 8R*2 (the MXU M dim was 16x
    # underutilized) and the mseg indicator is built once, not R times.
    # (empty under the outmm ablate: _shade_tail wrote rows directly)
    if vs_list:
        _compact_rows(out_ref, vs_list, 0, S=S, blk=blk, s_major=s_major)


def _shade_tail(out_ref, pk, sigma, app, dist, *, S, blk, n_basis,
                sh_deg, shading, distance_scale, s_major, ablate=(),
                row0=0, collect=None):
    """Shared kernel tail: per-channel shading (SH or RGB), per-sample
    color scale/shift, the segmented composite, and the compacted
    per-ray totals (written to out rows [row0, row0+8) — the fused
    patch kernel stacks four phases in one 32-row output block).

    collect: when a list, append the [8, blk] vs rows and RETURN
    without compacting — the caller batches all phases' rows into ONE
    segment-indicator matmul (M = 8*R*2 with the hi/lo split instead
    of 2 matmuls of M=8 per phase: the MXU's M dim was 16x
    underutilized and mseg was rebuilt per phase)."""
    # app rows are K-MAJOR (row k*3 + c; wb_t rows permuted at trace
    # time, fused_eval._plan_arrays): each basis coefficient's three
    # channels are a CONTIGUOUS [3, blk] slice, so the SH contraction
    # is n_basis FMAs on [3, blk] and the color scale/shift rides the
    # contiguous pk[5:8]/pk[8:11] rows. The previous channel-major
    # layout did 3*n_basis single-row sublane extracts + [1, blk] FMAs
    # (1/8 vreg utilization) — the tail was the kernel's largest stage
    # (1.39 ms/chunk of fn.1 4.52, shade_breakdown2b.log). Accumulation
    # stays k-ascending per channel — bit-identical to the row-major
    # form.
    if "sh" in ablate:
        rgb3 = app[0:3]
    elif shading == "rgb":
        # RGBRender: rgb = sigmoid(app features)
        # (reference utils/tensorf_utils.py:341-343)
        v = 1.0 / (1.0 + jnp.exp(-app[0:3]))
        rgb3 = v * (pk[5:8] + 1.0) + pk[8:11]
    else:
        shb = _sh_basis_rows(sh_deg, pk[11:12], pk[12:13], pk[13:14])
        e = jnp.zeros((3, blk), jnp.float32)
        for k in range(n_basis):
            e = e + app[3 * k:3 * k + 3] * shb[k]
        v = jnp.maximum(e + 0.5, 0.0)                      # sh_render
        # rgb * (scale + 1) + shift (tensorf_utils.py:267-273)
        rgb3 = v * (pk[5:8] + 1.0) + pk[8:11]

    # ---- composite: segmented (per-ray) scan in lane space. Two lane
    # orders: ray-major (lane = r*S + s — a ray's samples contiguous) and
    # S-major (lane = s*tile_r + r — the channels-first pipeline's native
    # order, where the CF -> kernel conversion keeps the 128-lane minor
    # dim intact instead of a pathological small-minor-dim transpose).
    # Lane shifts use pltpu.roll (circular) — concatenate-based shifts of
    # computed values hit a Mosaic layout-offset limitation; the
    # wraparound lanes are always masked off by the segment predicate.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    tile_r = blk // S
    if s_major:
        seg = lane // tile_r       # sample index of this lane
        step = tile_r              # lane distance to the next sample
    else:
        seg = lane % S
        step = 1
    nxt = pltpu.roll(dist, blk - step, 1)   # next sample's dist
    deltas = jnp.where(seg == S - 1, 1e10, nxt - dist)

    x = jnp.clip(sigma * (deltas * distance_scale), -_EXP_CLAMP,
                 _EXP_CLAMP)
    alpha = 1.0 - jnp.exp(-x)
    if "comp" in ablate:
        w = alpha
    else:
        log_trans = jnp.maximum(-x, _LOG_EPS)
        acc = log_trans
        shift = 1
        while shift < S:
            sh = pltpu.roll(acc, shift * step, 1)
            acc = acc + jnp.where(seg >= shift, sh, 0.0)
            shift *= 2
        # exclusive transmittance: shift the inclusive scan by one
        # in-segment
        prev = pltpu.roll(acc, step, 1)
        t_excl = jnp.exp(jnp.where(seg == 0, 0.0, prev))
        w = alpha * t_excl                                 # [1, blk]

    vs = jnp.concatenate(
        [w * rgb3, w, w * dist,
         jnp.zeros((3, blk), jnp.float32)], 0)             # [8, blk]
    if "outmm" in ablate:
        out_ref[row0:row0 + 8, :] = vs[:, :out_ref.shape[1]]
        return
    # bf16 hi/lo split HERE (phase-loop scope) so the f32 vs rows die
    # per phase — only 8+8 bf16 rows per phase stay live for the
    # batched compaction (same bytes as the f32 rows the per-phase
    # form kept; the fp_lane VMEM model is unchanged). Storing lo in
    # bf16 is value-identical to the MXU's own operand truncation of
    # an f32 lo at default precision.
    hi = vs.astype(jnp.bfloat16)
    lo = None if "outmm1" in ablate \
        else (vs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if collect is not None:
        collect.append((hi, lo))
        return
    _compact_rows(out_ref, [(hi, lo)], row0, S=S, blk=blk,
                  s_major=s_major)


def _seg_indicator(pt, *, S, blk, s_major):
    """[blk, pt] per-ray segment-indicator matrix M[n, j] = (ray(n) == j)
    for the compaction matmul; 0/1 so EXACT in bf16 (built bf16 — the
    MXU's default-precision path truncates f32 operands to bf16
    operand-side anyway, so the dtype is free)."""
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (blk, pt), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (blk, pt), 1)
    if s_major:
        return (r_iota % (blk // S) == j_iota).astype(jnp.bfloat16)
    return (r_iota // S == j_iota).astype(jnp.bfloat16)


def _compact_rows(out_ref, pairs, row0, *, S, blk, s_major):
    # per-ray totals as a segment-indicator matmul, compacting the output
    # to [rows, rays] (the old [8, N] write was ~268 MB/call + a 3.3 ms
    # strided host-side gather to extract lane S-1). M[r, j] = (r//S == j).
    # Precision: the default MXU path truncates f32 operands to bf16
    # (measured 2e-3 rgb error) and Precision.HIGHEST costs ~8 ms/8.4M
    # samples; but mseg is 0/1 — EXACT in bf16 — so splitting v into bf16
    # hi+lo gives f32-accurate totals at default precision. All phases'
    # hi AND lo rows ride ONE bf16 matmul (each output row is an
    # independent dot product, so batching is value-exact): M goes 8 per
    # dot (16x MXU M-underutilization, 2 dots per phase, mseg rebuilt
    # per phase) -> one M=16*R dot with mseg built once.
    # (A [1, blk] -> [rays, S] reshape + lane-sum would avoid the MXU
    # entirely but Mosaic rejects the shape cast.)
    pt = out_ref.shape[1]
    nv = 8 * len(pairs)
    mseg = _seg_indicator(pt, S=S, blk=blk, s_major=s_major)
    his = [h for h, _ in pairs]
    lows = [l for _, l in pairs if l is not None]
    d = jax.lax.dot_general(
        jnp.concatenate(his + lows, 0), mseg,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # [nv(*2), pt]
    if lows:
        out_ref[row0:row0 + nv, :] = d[:nv] + d[nv:]
    else:
        out_ref[row0:row0 + nv, :] = d[:nv]


def build_scalar_pack(xn, yn, zn, tn, cs, csh, dist, vd_rows,
                      extra_rows=()):
    """Assemble the [16, N] channels-first scalar pack from [N] rows —
    pure stacking of elementwise-derived rows, so XLA fuses the writes
    without any [N, k] -> [k, N] transpose. Validity and SH basis are
    derived in-kernel (from coords/dist and viewdir rows). extra_rows
    fill slots 14+ (row 14 = per-sample weights for the static net's
    use_weights_row)."""
    rows = [xn, yn, zn, tn, dist, cs[0], cs[1], cs[2],
            csh[0], csh[1], csh[2], *vd_rows, *extra_rows]
    n = rows[0].shape[0]
    while len(rows) < PACK_ROWS:
        rows.append(jnp.zeros((n,), jnp.float32))
    return jnp.stack(rows[:PACK_ROWS], 0)


def fused_shade_composite(rows, pack, time_table_t, wb_t, *,
                          S, W, H, TW, TH, n_density, n_basis,
                          density_shift, distance_scale, tile=64,
                          acc_dtype=jnp.bfloat16, interpret=None,
                          s_major=False, use_weights_row=False,
                          shading="sh", preblended=False, ablate=(),
                          anchors=None, patch_pxy=None, m0=0, m1=1,
                          patch_block=4):
    """Args:
      rows:   [N, 4C] bf16 gathered space quad rows (corner-major), or
              with preblended=True a [C, N] channels-first pre-blended
              feature array (the coherent patch-gather path,
              ops/pallas/patch_blend.py).
      pack:   [16, N] f32 scalar pack (build_scalar_pack; dist row 4,
              cs rows 5-7, csh rows 8-10, viewdir rows 11-13).
      s_major: lane order within each tile*S block — False: ray-major
              (n = r*S + s); True: S-major (n = s*tile + r, the
              channels-first pipeline's native block order). rows and
              pack must be pre-ordered accordingly.
      time_table_t: [(TH+2)*C, TWp] f32 zero-ring-padded time plane,
              keyframe-major rows (row k*C + c), z on lanes padded to a
              multiple of 128.
      wb_t:   [3*n_basis, C] f32 transposed basis matrix (density columns
              zeroed).

    Returns [8, N // S] f32 rows: r, g, b, acc, depth — one compacted
    column per ray (per-ray totals computed in-kernel via a
    segment-indicator matmul; per-block 128-lane padding is stripped
    before returning).

    preblended="phase_major": rows is the patch-blend kernel's RAW
    [4C, J=N/4] phase-major output. The caller's quarter-major ray
    permutation makes phase p's features the contiguous flat-column
    quarter [p*J, (p+1)*J), so block i simply reads rows block
    (i // (G/4), i % (G/4)) — the former phase_major_to_lane_major
    relayout copy (~0.8 ms/chunk each way on HW) becomes a BlockSpec
    index map.

    preblended="fused_patch": rows is the [J, px*py*C] gathered patch
    rows themselves (bf16) and `anchors` [2, J] the texel anchors —
    the patch-blend runs INSIDE this kernel (one invocation blends one
    J-block and shades all four phases sharing it), so the [4C, J] f32
    feature array never exists in HBM and the separate blend kernel's
    duplicate pack reads vanish. `patch_pxy` = (px, py); `m0`/`m1` the
    pack rows holding the plane coords.
    """
    if preblended == "fused_patch":
        px, py = patch_pxy
        C = rows.shape[1] // (px * py)
        N = pack.shape[1]
    elif preblended == "phase_major":
        C = rows.shape[0] // patch_block
        N = rows.shape[1] * patch_block
    elif preblended:
        C, N = rows.shape
    else:
        N = rows.shape[0]
        C4 = rows.shape[1]
        C = C4 // 4
    Rt = time_table_t.shape[1]          # padded z width (TWp)
    # TH == 0: uniform-time premixed table (fused_eval), [C, TWp]
    assert time_table_t.shape[0] == ((TH + 2) * C if TH else C), \
        time_table_t.shape
    blk = tile * S
    assert N % blk == 0, (N, blk)
    assert pack.shape == (PACK_ROWS, N), pack.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pt = ((tile + 127) // 128) * 128     # padded output lanes per block
    sh_deg = {1: 0, 4: 1, 9: 2, 16: 3, 25: 4}[n_basis] \
        if shading == "sh" else 0

    if preblended == "fused_patch":
        R = patch_block
        qR = (N // blk) // R
        assert (N // blk) % R == 0 and rows.shape[0] == N // R, \
            (N, blk, R, rows.shape)
        kern = functools.partial(
            _shade_kernel_fused_patch, S=S, blk=blk, W=W, H=H, TW=TW,
            TH=TH, Rt=Rt, C=C, px=px, py=py, m0=m0, m1=m1,
            n_density=n_density, n_basis=n_basis, sh_deg=sh_deg,
            density_shift=float(density_shift),
            distance_scale=float(distance_scale), acc_dtype=acc_dtype,
            s_major=s_major, use_weights_row=use_weights_row,
            shading=shading, R=R, ablate=tuple(ablate))
        out = pl.pallas_call(
            kern,
            grid=(qR,),
            in_specs=[
                pl.BlockSpec((blk, px * py * C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                *[pl.BlockSpec((PACK_ROWS, blk),
                               lambda i, _p=p: (0, i + _p * qR),
                               memory_space=pltpu.VMEM)
                  for p in range(R)],
                pl.BlockSpec(((TH + 2) * C if TH else C, Rt),
                             lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * n_basis, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8 * R, pt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8 * R, qR * pt),
                                           jnp.float32),
            interpret=interpret,
        )(rows, anchors, *([pack] * R), time_table_t, wb_t)
        # rows 8p hold phase p's totals for J-block i at column block i;
        # rearrange to the phase-major per-ray order (tiny [8, N/S]-
        # class copy)
        out = out.reshape(R, 8, qR, pt).transpose(1, 0, 2, 3).reshape(
            8, R * qR * pt)
        if pt != tile:
            out = out.reshape(8, N // blk, pt)[:, :, :tile].reshape(
                8, N // S)
        return out

    kern = functools.partial(
        _shade_kernel, S=S, blk=blk, W=W, H=H, TW=TW, TH=TH, Rt=Rt, C=C,
        n_density=n_density, n_basis=n_basis, sh_deg=sh_deg,
        density_shift=float(density_shift),
        distance_scale=float(distance_scale), acc_dtype=acc_dtype,
        s_major=s_major, use_weights_row=use_weights_row, shading=shading,
        preblended=preblended, ablate=tuple(ablate))

    grid = (N // blk,)
    if preblended == "phase_major":
        qR = grid[0] // patch_block
        assert grid[0] % patch_block == 0 \
            and rows.shape[1] % blk == 0, (grid, rows.shape, blk)
        rows_spec = pl.BlockSpec((C, blk),
                                 lambda i: (i // qR, i % qR),
                                 memory_space=pltpu.VMEM)
    elif preblended:
        rows_spec = pl.BlockSpec((C, blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    else:
        rows_spec = pl.BlockSpec((blk, C4), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            rows_spec,
            pl.BlockSpec((PACK_ROWS, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(((TH + 2) * C if TH else C, Rt),
                         lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n_basis, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, pt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, (N // blk) * pt), jnp.float32),
        interpret=interpret,
    )(rows, pack, time_table_t, wb_t)
    if pt != tile:
        out = out.reshape(8, N // blk, pt)[:, :, :tile].reshape(8, N // S)
    return out


# ---------------------------------------------------------------------------
# Multi-axis STATIC kernel: the full VM decomposition (plane x line per
# active axis, reference tensorf_base.py:1059-1148) for NoSample nets with
# 2-3 active axes (llff/donerf/shiny-family [8, 4, 4] grids). Per-axis
# gathered quad rows + a per-axis VMEM line table; corner weights per axis
# come from the xn/yn/zn pack rows via MAT_MODE; per-axis products
# concatenate into the basis matmul. Shares the shade/composite tail.
# ---------------------------------------------------------------------------

_MAT_MODE = ((0, 1), (0, 2), (1, 2))
_VEC_MODE = (2, 1, 0)


def _multi_core(pk, get_feat_p, ttab_refs, wb_ref, out_ref, row0,
                *, axes, S, blk, line_lens, time_hs, dens_c, app_c,
                n_basis, sh_deg, density_shift, distance_scale,
                acc_dtype, s_major, use_weights_row, shading):
    """Per-phase multi-axis body: per-axis space features (via
    get_feat_p(a, pk)) x line/time-plane second factors, density,
    basis matmul, tail. Writes out rows [row0, row0+8)."""
    comp = [pk[0:1], pk[1:2], pk[2:3]]
    tn = pk[3:4]
    dist = pk[4:5]
    valid = ((jnp.abs(comp[0]) <= 1.0) & (jnp.abs(comp[1]) <= 1.0)
             & (jnp.abs(comp[2]) <= 1.0)
             & (dist > 0.0)).astype(jnp.float32)

    dfeat = jnp.zeros((1, blk), jnp.float32)
    app_parts = []
    for a, ax in enumerate(axes):
        v = _VEC_MODE[ax]
        C_a = dens_c[a] + app_c[a]
        feat_p = get_feat_p(a, pk)

        # second factor: ring-padded table, two-hot MXU lookup.
        # time_hs[a] == 0: a pure 1D line [C_a, Lp] (static VM).
        # time_hs[a] == TH > 0: a TIME PLANE [(TH+2)*C_a, Lp] — the
        # z-two-hot fetches every keyframe row, then the tn bilinear
        # mixes them (the dynamic kernel's separable lookup, per axis)
        L = line_lens[a]
        pz = (comp[v] + 1.0) * 0.5 * (L - 1)
        zb, fz, z_lo, z_hi = _corner_weights(pz, L)
        Rt = ttab_refs[a].shape[1]
        TH = time_hs[a]
        zfeat = _twohot_matmul(ttab_refs[a], zb, (1.0 - fz) * z_lo,
                               fz * z_hi, Rt, blk, acc_dtype,
                               (TH + 2) * C_a if TH else C_a,
                               rt_real=-(-(L + 2) // 8) * 8,
                               pzp=pz + 1.0)
        if TH == 0:
            feat_l = zfeat                                 # [C_a, blk]
        else:
            ptt = (tn + 1.0) * 0.5 * (TH - 1)
            tb, ft, t_lo, t_hi = _corner_weights(ptt, TH)
            t0w = (1.0 - ft) * t_lo
            t1w = ft * t_hi
            feat_l = jnp.zeros((C_a, blk), jnp.float32)
            for k in range(TH + 2):
                mk = (jnp.where(tb == k, t0w, 0.0)
                      + jnp.where(tb == k - 1, t1w, 0.0))
                feat_l = feat_l + zfeat[k * C_a:(k + 1) * C_a] * mk

        prod = feat_p * feat_l
        dfeat = dfeat + jnp.sum(prod[:dens_c[a]], 0, keepdims=True)
        app_parts.append(prod[dens_c[a]:])

    if use_weights_row:
        dfeat = dfeat * pk[14:15]
    sigma = jnp.maximum(dfeat + density_shift, 0.0) * valid

    app_cat = jnp.concatenate(app_parts, 0)      # [sum app_c, blk]
    app = jax.lax.dot_general(
        wb_ref[:], app_cat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [3K, blk]
    _shade_tail(out_ref, pk, sigma, app, dist, S=S, blk=blk,
                n_basis=n_basis, sh_deg=sh_deg, shading=shading,
                distance_scale=distance_scale, s_major=s_major,
                row0=row0)


def _shade_kernel_multi(*refs, axes, S, blk, grid_dims, line_lens,
                        time_hs, dens_c, app_c, n_basis, sh_deg,
                        density_shift, distance_scale, acc_dtype,
                        s_major, use_weights_row, shading,
                        preblended=False):
    n_ax = len(axes)
    rows_refs = refs[:n_ax]
    pack_ref = refs[n_ax]
    ttab_refs = refs[n_ax + 1:2 * n_ax + 1]
    wb_ref = refs[2 * n_ax + 1]
    out_ref = refs[2 * n_ax + 2]

    pk = pack_ref[:]                                       # [16, blk]

    def get_feat_p(a, pk):
        ax = axes[a]
        m0, m1 = _MAT_MODE[ax]
        W, H = grid_dims[a]
        C_a = dens_c[a] + app_c[a]
        if preblended:
            # coherent patch-gather: per-axis channels-first features
            return rows_refs[a][:].astype(jnp.float32)     # [C_a, blk]
        px = (pk[m0:m0 + 1] + 1.0) * 0.5 * (W - 1)
        py = (pk[m1:m1 + 1] + 1.0) * 0.5 * (H - 1)
        _, fx, x_lo, x_hi = _corner_weights(px, W)
        _, fy, y_lo, y_hi = _corner_weights(py, H)
        w00 = (1.0 - fy) * (1.0 - fx) * y_lo * x_lo
        w01 = (1.0 - fy) * fx * y_lo * x_hi
        w10 = fy * (1.0 - fx) * y_hi * x_lo
        w11 = fy * fx * y_hi * x_hi
        q = rows_refs[a][:].astype(jnp.float32).T          # [4C_a, blk]
        return (q[0 * C_a:1 * C_a] * w00 + q[1 * C_a:2 * C_a] * w01
                + q[2 * C_a:3 * C_a] * w10 + q[3 * C_a:4 * C_a] * w11)

    _multi_core(pk, get_feat_p, ttab_refs, wb_ref, out_ref, 0,
                axes=axes, S=S, blk=blk, line_lens=line_lens,
                time_hs=time_hs, dens_c=dens_c, app_c=app_c,
                n_basis=n_basis, sh_deg=sh_deg,
                density_shift=density_shift,
                distance_scale=distance_scale, acc_dtype=acc_dtype,
                s_major=s_major, use_weights_row=use_weights_row,
                shading=shading)


def _shade_kernel_multi_fused_patch(*refs, axes, S, blk, grid_dims,
                                    line_lens, time_hs, dens_c, app_c,
                                    px, py, n_basis, sh_deg,
                                    density_shift, distance_scale,
                                    acc_dtype, s_major,
                                    use_weights_row, shading, R=4):
    """Multi-axis blend+shade fusion: one invocation reads one J-block
    of per-axis gathered patch rows + anchors and shades all four
    phases (see _shade_kernel_fused_patch).

    AXIS-OUTER / PHASE-INNER (round-5 VMEM fix): the round-4
    phase-outer form held every axis's [P*C_a, blk] f32 patch
    transpose live across all four phases simultaneously (~19 MB at
    llff channel counts, tile=64) and failed the Mosaic compile on
    BOTH llff and n3d patch legs (multiaxis_patch2.log, HTTP 500 at
    every tile). This form walks axes in the outer loop so exactly ONE
    axis's f32 patch buffer is live at a time, accumulating per-phase
    density sums and per-phase app-basis partial dots (wb column
    slices per axis — f32-add associativity class, parity-gated at
    2e-4 vs the general path like every kernel change).

    CALLER CONTRACT: the call's `tile` MUST equal the chunk tile the
    pack was laid out with — the kernel decodes lanes via
    tile_r = blk // S against the baked S-major order. The round-5
    variant-local tile_fp violated this and produced the llff 9.4e-2
    HW parity failures originally misattributed to a Mosaic
    miscompile (CPU repro: forced mismatch = 0.27)."""
    n_ax = len(axes)
    rows_refs = refs[:n_ax]
    anc_refs = refs[n_ax:2 * n_ax]
    pk_refs = refs[2 * n_ax:2 * n_ax + R]
    ttab_refs = refs[2 * n_ax + R:3 * n_ax + R]
    wb_ref = refs[3 * n_ax + R]
    out_ref = refs[3 * n_ax + R + 1]

    pks = [r[:] for r in pk_refs]                       # R x [16, blk]
    wb = wb_ref[:]                                      # [3K, sum app_c]
    dfeats = [jnp.zeros((1, blk), jnp.float32) for _ in range(R)]
    apps = [jnp.zeros((3 * n_basis, blk), jnp.float32)
            for _ in range(R)]

    app_off = 0
    for a, ax in enumerate(axes):
        m0, m1 = _MAT_MODE[ax]
        v = _VEC_MODE[ax]
        W, H = grid_dims[a]
        C_a = dens_c[a] + app_c[a]
        L = line_lens[a]
        TH = time_hs[a]
        Rt = ttab_refs[a].shape[1]
        patch_a = rows_refs[a][:].T      # [P*C_a, blk] at table dtype
        x0 = anc_refs[a][0:1]
        y0 = anc_refs[a][1:2]
        wb_a = wb[:, app_off:app_off + app_c[a]]
        app_off += app_c[a]
        for p in range(R):
            pk = pks[p]
            u = (pk[m0:m0 + 1] + 1.0) * 0.5 * (W - 1) - x0
            vv = (pk[m1:m1 + 1] + 1.0) * 0.5 * (H - 1) - y0
            feat_p = jnp.zeros((C_a, blk), jnp.float32)
            for ty in range(py):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(vv - ty))
                for tx in range(px):
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(u - tx))
                    t = ty * px + tx
                    feat_p = feat_p + (wx * wy) * patch_a[
                        t * C_a:(t + 1) * C_a].astype(jnp.float32)
            # second factor (identical op order to _multi_core)
            pz = (pk[v:v + 1] + 1.0) * 0.5 * (L - 1)
            zb, fz, z_lo, z_hi = _corner_weights(pz, L)
            zfeat = _twohot_matmul(ttab_refs[a], zb, (1.0 - fz) * z_lo,
                                   fz * z_hi, Rt, blk, acc_dtype,
                                   (TH + 2) * C_a if TH else C_a,
                                   rt_real=-(-(L + 2) // 8) * 8,
                                   pzp=pz + 1.0)
            if TH == 0:
                feat_l = zfeat
            else:
                tn = pk[3:4]
                ptt = (tn + 1.0) * 0.5 * (TH - 1)
                tb, ft, t_lo, t_hi = _corner_weights(ptt, TH)
                t0w = (1.0 - ft) * t_lo
                t1w = ft * t_hi
                feat_l = jnp.zeros((C_a, blk), jnp.float32)
                for k in range(TH + 2):
                    mk = (jnp.where(tb == k, t0w, 0.0)
                          + jnp.where(tb == k - 1, t1w, 0.0))
                    feat_l = feat_l + zfeat[k * C_a:(k + 1) * C_a] * mk

            prod = feat_p * feat_l
            dfeats[p] = dfeats[p] + jnp.sum(
                prod[:dens_c[a]], 0, keepdims=True)
            apps[p] = apps[p] + jax.lax.dot_general(
                wb_a, prod[dens_c[a]:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    vs_list = []
    for p in range(R):
        pk = pks[p]
        dist = pk[4:5]
        valid = ((jnp.abs(pk[0:1]) <= 1.0) & (jnp.abs(pk[1:2]) <= 1.0)
                 & (jnp.abs(pk[2:3]) <= 1.0)
                 & (dist > 0.0)).astype(jnp.float32)
        dfeat = dfeats[p]
        if use_weights_row:
            dfeat = dfeat * pk[14:15]
        sigma = jnp.maximum(dfeat + density_shift, 0.0) * valid
        _shade_tail(out_ref, pk, sigma, apps[p], dist, S=S, blk=blk,
                    n_basis=n_basis, sh_deg=sh_deg, shading=shading,
                    distance_scale=distance_scale, s_major=s_major,
                    row0=8 * p, collect=vs_list)
    # ONE batched compaction matmul across phases (see
    # _shade_kernel_fused_patch) — value-exact row batching
    if vs_list:
        _compact_rows(out_ref, vs_list, 0, S=S, blk=blk, s_major=s_major)


def fused_shade_composite_multi(rows_list, pack, line_tabs, wb_t, *,
                                axes, S, grid_dims, line_lens, dens_c,
                                app_c, n_basis, density_shift,
                                distance_scale, time_hs=None, tile=64,
                                acc_dtype=jnp.bfloat16, interpret=None,
                                s_major=False, use_weights_row=False,
                                shading="sh", preblended=False,
                                anchors_list=None, patch_pxy=None,
                                patch_block=4):
    """Multi-axis static fused render.

    rows_list: per-axis [N, 4*C_a] bf16 gathered quad rows, or with
               preblended=True per-axis [C_a, N] channels-first
               pre-blended features (ops/pallas/patch_blend.py).
    line_tabs: per-axis [C_a, Lp] f32 ring-padded line tables (z width
               padded to a 128 multiple; Lp = L + 2 + pad).
    wb_t:      [3K, sum(app_c)] transposed basis matrix (app rows only).
    grid_dims: per-axis (W, H) plane dims.
    """
    if preblended == "fused_patch":
        N = pack.shape[1]
    elif preblended == "phase_major":
        N = rows_list[0].shape[1] * patch_block
    elif preblended:
        N = rows_list[0].shape[1]
    else:
        N = rows_list[0].shape[0]
    blk = tile * S
    assert N % blk == 0, (N, blk)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pt = ((tile + 127) // 128) * 128
    sh_deg = {1: 0, 4: 1, 9: 2, 16: 3, 25: 4}[n_basis] \
        if shading == "sh" else 0
    if time_hs is None:
        time_hs = (0,) * len(axes)

    if preblended == "fused_patch":
        px, py = patch_pxy
        R = patch_block
        qR = (N // blk) // R
        assert (N // blk) % R == 0, (N, blk, R)
        kern = functools.partial(
            _shade_kernel_multi_fused_patch, axes=tuple(axes), S=S,
            blk=blk, grid_dims=tuple(tuple(g) for g in grid_dims),
            line_lens=tuple(int(L) for L in line_lens),
            time_hs=tuple(int(t) for t in time_hs),
            dens_c=tuple(dens_c), app_c=tuple(app_c), px=px, py=py,
            n_basis=n_basis, sh_deg=sh_deg,
            density_shift=float(density_shift),
            distance_scale=float(distance_scale), acc_dtype=acc_dtype,
            s_major=s_major, use_weights_row=use_weights_row,
            shading=shading, R=R)
        in_specs = [pl.BlockSpec((blk, r.shape[1]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
                    for r in rows_list]
        in_specs += [pl.BlockSpec((2, blk), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
                     for _ in rows_list]
        in_specs += [pl.BlockSpec((PACK_ROWS, blk),
                                  lambda i, _p=p: (0, i + _p * qR),
                                  memory_space=pltpu.VMEM)
                     for p in range(R)]
        in_specs += [pl.BlockSpec(t.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
                     for t in line_tabs]
        in_specs.append(pl.BlockSpec(wb_t.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kern,
            grid=(qR,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8 * R, pt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8 * R, qR * pt),
                                           jnp.float32),
            interpret=interpret,
        )(*rows_list, *anchors_list, *([pack] * R),
          *line_tabs, wb_t)
        out = out.reshape(R, 8, qR, pt).transpose(1, 0, 2, 3).reshape(
            8, R * qR * pt)
        if pt != tile:
            out = out.reshape(8, N // blk, pt)[:, :, :tile].reshape(
                8, N // S)
        return out

    kern = functools.partial(
        _shade_kernel_multi, axes=tuple(axes), S=S, blk=blk,
        grid_dims=tuple(tuple(g) for g in grid_dims),
        line_lens=tuple(int(L) for L in line_lens),
        time_hs=tuple(int(t) for t in time_hs),
        dens_c=tuple(dens_c), app_c=tuple(app_c), n_basis=n_basis,
        sh_deg=sh_deg, density_shift=float(density_shift),
        distance_scale=float(distance_scale), acc_dtype=acc_dtype,
        s_major=s_major, use_weights_row=use_weights_row,
        shading=shading, preblended=preblended)

    if preblended == "phase_major":
        # see fused_shade_composite: phase p = contiguous flat-column
        # 1/R section, so the relayout is a BlockSpec index map
        qR = (N // blk) // patch_block
        assert (N // blk) % patch_block == 0, (N, blk, patch_block)
        in_specs = [pl.BlockSpec((r.shape[0] // patch_block, blk),
                                 lambda i: (i // qR, i % qR),
                                 memory_space=pltpu.VMEM)
                    for r in rows_list]
    elif preblended:
        in_specs = [pl.BlockSpec((r.shape[0], blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
                    for r in rows_list]
    else:
        in_specs = [pl.BlockSpec((blk, r.shape[1]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
                    for r in rows_list]
    in_specs.append(pl.BlockSpec((PACK_ROWS, blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM))
    in_specs += [pl.BlockSpec(t.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
                 for t in line_tabs]
    in_specs.append(pl.BlockSpec(wb_t.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kern,
        grid=(N // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, pt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, (N // blk) * pt), jnp.float32),
        interpret=interpret,
    )(*rows_list, pack, *line_tabs, wb_t)
    if pt != tile:
        out = out.reshape(8, N // blk, pt)[:, :, :tile].reshape(8, N // S)
    return out
