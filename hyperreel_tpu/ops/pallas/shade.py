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
  4 valid     5 dist (sorted ray distance)
  6..8  color_scale rgb   9..11 color_shift rgb
  12..20 SH basis rows (deg 2)   21..23 zero pad
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_EPS = -23.025850929940457
_EXP_CLAMP = 70.0
PACK_ROWS = 24


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


def _shade_kernel(rows_ref, pack_ref, ttab_ref, wb_ref, out_ref,
                  *, S, blk, W, H, TW, TH, Rt, C, n_density, n_basis,
                  density_shift, distance_scale, acc_dtype):
    pk = pack_ref[:]                                       # [24, blk]
    xn = pk[0:1]
    yn = pk[1:2]
    zn = pk[2:3]
    tn = pk[3:4]
    valid = pk[4:5]
    dist = pk[5:6]

    # ---- space bilinear from gathered quad rows (corner-major 4 x C)
    px = (xn + 1.0) * 0.5 * (W - 1)
    py = (yn + 1.0) * 0.5 * (H - 1)
    _, fx, x_lo, x_hi = _corner_weights(px, W)
    _, fy, y_lo, y_hi = _corner_weights(py, H)
    w00 = (1.0 - fy) * (1.0 - fx) * y_lo * x_lo
    w01 = (1.0 - fy) * fx * y_lo * x_hi
    w10 = fy * (1.0 - fx) * y_hi * x_lo
    w11 = fy * fx * y_hi * x_hi

    q = rows_ref[:].astype(jnp.float32).T                  # [4C, blk]
    feat_s = (q[0 * C:1 * C] * w00 + q[1 * C:2 * C] * w01
              + q[2 * C:3 * C] * w10 + q[3 * C:4 * C] * w11)

    # ---- time-plane bilinear, SEPARABLE: a z-axis two-hot MXU matmul
    # fetches the z-interpolated features of EVERY keyframe row at once,
    # then the (few) keyframe rows mix with per-sample t weights. The
    # earlier joint four-hot built a [Rt=(TH+2)(TW+2), blk] one-hot —
    # ~12 VPU ops over 4x more rows dominated the kernel.
    pz = (zn + 1.0) * 0.5 * (TW - 1)
    pt = (tn + 1.0) * 0.5 * (TH - 1)
    zb, fz, z_lo, z_hi = _corner_weights(pz, TW)
    tb, ft, t_lo, t_hi = _corner_weights(pt, TH)

    iota = jax.lax.broadcasted_iota(jnp.int32, (Rt, blk), 0)
    a_z = (jnp.where(iota == zb, (1.0 - fz) * z_lo, 0.0)
           + jnp.where(iota == zb + 1, fz * z_hi, 0.0))    # [TWp, blk]
    zfeat = jax.lax.dot_general(
        ttab_ref[:].astype(acc_dtype), a_z.astype(acc_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [(TH+2)C, blk]
    t0w = (1.0 - ft) * t_lo
    t1w = ft * t_hi
    feat_t = jnp.zeros_like(feat_s)
    for k in range(TH + 2):
        mk = (jnp.where(tb == k, t0w, 0.0)
              + jnp.where(tb == k - 1, t1w, 0.0))          # [1, blk]
        feat_t = feat_t + zfeat[k * C:(k + 1) * C] * mk

    prod = feat_s * feat_t                                 # [C, blk]

    # ---- density (fea2denseAct relu)
    sigma = jnp.maximum(
        jnp.sum(prod[:n_density], 0, keepdims=True) + density_shift, 0.0)
    sigma = sigma * valid                                  # [1, blk]

    # ---- appearance: basis matmul + SH shading + color scale/shift
    app = jax.lax.dot_general(
        wb_ref[:], prod, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [3K, blk]
    shb = pk[12:12 + n_basis]                              # [K, blk]
    rgb = []
    for c in range(3):
        e = jnp.sum(app[c * n_basis:(c + 1) * n_basis] * shb, 0,
                    keepdims=True)
        v = jnp.maximum(e + 0.5, 0.0)                      # sh_render
        # rgb * (scale + 1) + shift (utils/tensorf_utils.py:267-273)
        v = v * (pk[6 + c:7 + c] + 1.0) + pk[9 + c:10 + c]
        rgb.append(v)

    # ---- composite: segmented (per-ray, S lanes each) scan in lane space.
    # Lane shifts use pltpu.roll (circular) — concatenate-based shifts of
    # computed values hit a Mosaic layout-offset limitation; the
    # wraparound lanes are always masked off by the segment predicate.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    seg = lane % S
    nxt = pltpu.roll(dist, blk - 1, 1)      # dist shifted left by one
    deltas = jnp.where(seg == S - 1, 1e10, nxt - dist)

    x = jnp.clip(sigma * (deltas * distance_scale), -_EXP_CLAMP,
                 _EXP_CLAMP)
    alpha = 1.0 - jnp.exp(-x)
    log_trans = jnp.maximum(-x, _LOG_EPS)
    acc = log_trans
    shift = 1
    while shift < S:
        sh = pltpu.roll(acc, shift, 1)
        acc = acc + jnp.where(seg >= shift, sh, 0.0)
        shift *= 2
    # exclusive transmittance: shift the inclusive scan by one in-segment
    prev = pltpu.roll(acc, 1, 1)
    t_excl = jnp.exp(jnp.where(seg == 0, 0.0, prev))
    w = alpha * t_excl                                     # [1, blk]

    def seg_sum(v):
        s_acc = v
        sh = 1
        while sh < S:
            shd = pltpu.roll(s_acc, sh, 1)
            s_acc = s_acc + jnp.where(seg >= sh, shd, 0.0)
            sh *= 2
        return s_acc  # inclusive; lane S-1 of each segment = total

    out_ref[0:1, :] = seg_sum(w * rgb[0])
    out_ref[1:2, :] = seg_sum(w * rgb[1])
    out_ref[2:3, :] = seg_sum(w * rgb[2])
    out_ref[3:4, :] = seg_sum(w)
    out_ref[4:5, :] = seg_sum(w * dist)
    out_ref[5:8, :] = jnp.zeros((3, blk), jnp.float32)


def build_scalar_pack(xn, yn, zn, tn, valid, cs, csh, dist, shb_rows):
    """Assemble the [24, N] channels-first scalar pack from [N] rows —
    pure stacking of elementwise-derived rows, so XLA fuses the writes
    without any [N, k] -> [k, N] transpose."""
    rows = [xn, yn, zn, tn, valid, dist, cs[0], cs[1], cs[2],
            csh[0], csh[1], csh[2], *shb_rows]
    n = rows[0].shape[0]
    while len(rows) < PACK_ROWS:
        rows.append(jnp.zeros((n,), jnp.float32))
    return jnp.stack(rows[:PACK_ROWS], 0)


def fused_shade_composite(rows, pack, time_table_t, wb_t, *,
                          S, W, H, TW, TH, n_density, n_basis,
                          density_shift, distance_scale, tile=64,
                          acc_dtype=jnp.bfloat16, interpret=None):
    """Args:
      rows:   [N, 4C] bf16 gathered space quad rows (corner-major).
      pack:   [24, N] f32 scalar pack (build_scalar_pack; NOTE the row
              order there: dist is row 5, cs rows 6-8, csh rows 9-11).
      time_table_t: [(TH+2)*C, TWp] f32 zero-ring-padded time plane,
              keyframe-major rows (row k*C + c), z on lanes padded to a
              multiple of 128.
      wb_t:   [3*n_basis, C] f32 transposed basis matrix (density columns
              zeroed).

    Returns [8, N] f32 rows: r, g, b, acc, depth as INCLUSIVE per-segment
    scans — lane S-1 of each S-lane segment holds the ray total; callers
    take out[:, S-1::S].
    """
    N = rows.shape[0]
    C4 = rows.shape[1]
    C = C4 // 4
    Rt = time_table_t.shape[1]          # padded z width (TWp)
    assert time_table_t.shape[0] == (TH + 2) * C, time_table_t.shape
    blk = tile * S
    assert N % blk == 0, (N, blk)
    assert pack.shape == (PACK_ROWS, N), pack.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kern = functools.partial(
        _shade_kernel, S=S, blk=blk, W=W, H=H, TW=TW, TH=TH, Rt=Rt, C=C,
        n_density=n_density, n_basis=n_basis,
        density_shift=float(density_shift),
        distance_scale=float(distance_scale), acc_dtype=acc_dtype)

    grid = (N // blk,)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, C4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PACK_ROWS, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(((TH + 2) * C, Rt), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n_basis, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        interpret=interpret,
    )(rows, pack, time_table_t, wb_t)
    return out
