"""Fused Pallas render core for the dynamic HyperReel color net
(TensorVMKeyframeTime, reference nlf/nets/tensorf_dynamic.py:287-371 +
sh shading utils/sh_utils.py + composite utils/tensorf_utils.py:242-253).

One kernel consumes the XLA space-plane quad-row gather output and does
everything downstream on-chip:

  space bilinear corner-reduce  (was: 2 u32 HBM relayout copies + reduce
                                 fusions, ~17 ms per 262144-ray chunk)
  time-plane lookup             (was: a second N-row HBM gather, ~15 ms;
                                 now a VMEM-resident "four-hot" MXU matmul:
                                 A[n, r] = sum_k w_k[n] * (r == base_k[n]),
                                 A @ table = bilinear time features)
  space*time product, basis matmul, SH shading, per-sample color
  scale/shift, and the per-ray log-transmittance composite.

Layout rules discovered on v5e Mosaic (experiments/exp_pallas_probe2.py):
  * per-sample scalars enter as 1D dense arrays (a [N, k<128] array is
    lane-padded to [N, 128] in HBM -> 4.3 GB of traffic at 8.4M samples);
  * per-ray data enters as [TILE, k] blocks and is broadcast to samples
    with jnp.repeat (np.repeat semantics confirmed);
  * reshape (N, 1) -> (TILE, S) works (composite direction); the reverse
    does not lower, hence the 1D-input rule.

Eval-only (no VJP); training keeps the packed-scatter XLA path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_EPS = -23.025850929940457
_EXP_CLAMP = 70.0


def _corner_cols(p, lim):
    """Pixel coord -> (padded-table base index col, frac, low-corner
    in-bounds, high-corner in-bounds). Matches grid_sample quad indexing
    (ops/grid_sample.py:269-283): base clamped to [-1, lim-1] + 1 into a
    zero-padded table."""
    p0 = jnp.floor(p)
    frac = p - p0
    base = (jnp.clip(p0, -1.0, lim - 1.0) + 1.0).astype(jnp.int32)
    in_lo = (p0 >= 0.0) & (p0 <= lim - 1.0)
    in_hi = (p0 + 1.0 >= 0.0) & (p0 + 1.0 <= lim - 1.0)
    return base, frac, in_lo.astype(jnp.float32), in_hi.astype(jnp.float32)


def _shade_composite_kernel(
        rows_ref, xn_ref, yn_ref, zn_ref, tn_ref, valid_ref,
        cs0_ref, cs1_ref, cs2_ref, csh0_ref, csh1_ref, csh2_ref,
        dists_ref, shb_ref, ttab_ref, wb_ref, out_ref,
        *, S, TILE, W, H, TW, TH, Rt, C, n_density, app_dim, n_basis,
        density_shift, distance_scale, white_bg, acc_dtype):
    N = TILE * S

    # ---- space bilinear from gathered quad rows (corner-major 4 x C)
    xn = xn_ref[:].reshape(N, 1)
    yn = yn_ref[:].reshape(N, 1)
    px = (xn + 1.0) * 0.5 * (W - 1)
    py = (yn + 1.0) * 0.5 * (H - 1)
    _, fx, x_lo, x_hi = _corner_cols(px, W)
    _, fy, y_lo, y_hi = _corner_cols(py, H)
    w00 = (1.0 - fy) * (1.0 - fx) * y_lo * x_lo
    w01 = (1.0 - fy) * fx * y_lo * x_hi
    w10 = fy * (1.0 - fx) * y_hi * x_lo
    w11 = fy * fx * y_hi * x_hi

    q = rows_ref[:].astype(jnp.float32)                     # [N, 4C]
    feat_s = (q[:, 0 * C:1 * C] * w00 + q[:, 1 * C:2 * C] * w01
              + q[:, 2 * C:3 * C] * w10 + q[:, 3 * C:4 * C] * w11)

    # ---- time-plane bilinear as a four-hot MXU matmul over the
    # VMEM-resident padded table [Rt, C]
    zn = zn_ref[:].reshape(N, 1)
    tn = tn_ref[:].reshape(N, 1)
    pz = (zn + 1.0) * 0.5 * (TW - 1)
    pt = (tn + 1.0) * 0.5 * (TH - 1)
    zb, fz, z_lo, z_hi = _corner_cols(pz, TW)
    tb, ft, t_lo, t_hi = _corner_cols(pt, TH)
    stride = TW + 2                 # padded plane is [TH+2, TW+2]
    base = tb * stride + zb                                 # [N, 1]
    tw00 = (1.0 - ft) * (1.0 - fz) * t_lo * z_lo
    tw01 = (1.0 - ft) * fz * t_lo * z_hi
    tw10 = ft * (1.0 - fz) * t_hi * z_lo
    tw11 = ft * fz * t_hi * z_hi

    iota = jax.lax.broadcasted_iota(jnp.int32, (N, Rt), 1)
    A = (jnp.where(iota == base, tw00, 0.0)
         + jnp.where(iota == base + 1, tw01, 0.0)
         + jnp.where(iota == base + stride, tw10, 0.0)
         + jnp.where(iota == base + stride + 1, tw11, 0.0))
    feat_t = jax.lax.dot_general(
        A.astype(acc_dtype), ttab_ref[:].astype(acc_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [N, C]

    prod = feat_s * feat_t                                  # [N, C]

    # ---- density (fea2denseAct relu, reference tensorf_base.py)
    sigma_feat = jnp.sum(prod[:, :n_density], axis=1, keepdims=True)
    sigma = jnp.maximum(sigma_feat + density_shift, 0.0)
    sigma = sigma * valid_ref[:].reshape(N, 1)

    # ---- appearance: basis matmul + SH shading
    app = jax.lax.dot_general(
        prod, wb_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [N, 3*n_basis]
    shb = jnp.repeat(shb_ref[:], S, axis=0)                 # [N, n_basis]
    shb3 = jnp.concatenate([shb, shb, shb], axis=1)         # [N, 3*n_basis]
    e = app * shb3
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 3 * n_basis), 1)
    r = jnp.sum(jnp.where(lane < n_basis, e, 0.0), 1, keepdims=True)
    g = jnp.sum(jnp.where((lane >= n_basis) & (lane < 2 * n_basis), e, 0.0),
                1, keepdims=True)
    b = jnp.sum(jnp.where(lane >= 2 * n_basis, e, 0.0), 1, keepdims=True)
    rgb = [jnp.maximum(v + 0.5, 0.0) for v in (r, g, b)]    # sh_render

    # per-sample color scale/shift: rgb * (scale + 1) + shift
    # (reference utils/tensorf_utils.py:267-273)
    cs = (cs0_ref, cs1_ref, cs2_ref)
    csh = (csh0_ref, csh1_ref, csh2_ref)
    rgb = [rgb[c] * (cs[c][:].reshape(N, 1) + 1.0)
           + csh[c][:].reshape(N, 1) for c in range(3)]

    # ---- composite (log-direct transmittance, ops/pallas/composite.py)
    dist = dists_ref[:]                                     # [TILE, S]
    deltas = jnp.concatenate(
        [dist[:, 1:] - dist[:, :-1],
         jnp.full_like(dist[:, :1], 1e10)], 1)
    sig2 = sigma.reshape(TILE, S)
    x = jnp.clip(sig2 * (deltas * distance_scale), -_EXP_CLAMP, _EXP_CLAMP)
    alpha = 1.0 - jnp.exp(-x)
    log_trans = jnp.maximum(-x, _LOG_EPS)
    acc = log_trans
    shift = 1
    while shift < S:
        acc = acc + jnp.concatenate(
            [jnp.zeros_like(acc[:, :shift]), acc[:, :-shift]], 1)
        shift *= 2
    t_excl = jnp.exp(jnp.concatenate(
        [jnp.zeros_like(acc[:, :1]), acc[:, :-1]], 1))
    w = alpha * t_excl                                      # [TILE, S]

    acc_map = jnp.sum(w, 1, keepdims=True)
    for c in range(3):
        rc = rgb[c].reshape(TILE, S)
        out_ref[:, c:c + 1] = jnp.sum(w * rc, 1, keepdims=True)
    out_ref[:, 3:4] = acc_map
    out_ref[:, 4:5] = jnp.sum(w * dist, 1, keepdims=True)   # depth


def fused_shade_composite(rows, xn, yn, zn, tn, valid, cs, csh,
                          dists, shb, time_table, wb, *,
                          W, H, TW, TH, n_density, density_shift,
                          distance_scale, white_bg=False, tile=64,
                          acc_dtype=jnp.bfloat16, interpret=None):
    """Args:
      rows:  [N, 4C] bf16 gathered space quad rows (corner-major).
      xn, yn, zn, tn, valid: [N] f32 per-sample scalars (normalized
             space/time coords, validity mask).
      cs, csh: 3-tuples of [N] f32 per-sample color scale/shift channels.
      dists: [B, S] f32 sorted ray distances.
      shb:   [B, n_basis] f32 per-ray SH basis values.
      time_table: [Rt, C] f32 zero-ring-padded flattened time plane,
             rows = (TH+2)*(TW+2) padded up to a lane multiple.
      wb:    [C, 3*n_basis] f32 basis matrix (density rows zeroed).

    Returns [B, 8] f32: rgb, acc, depth, zeros.
    """
    B, S = dists.shape
    N = B * S
    C4 = rows.shape[1]
    C = C4 // 4
    Rt = time_table.shape[0]
    n_basis = shb.shape[1]
    assert wb.shape == (C, 3 * n_basis), (wb.shape, C, n_basis)
    assert B % tile == 0, (B, tile)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kern = functools.partial(
        _shade_composite_kernel, S=S, TILE=tile, W=W, H=H, TW=TW, TH=TH,
        Rt=Rt, C=C, n_density=n_density, app_dim=3 * n_basis,
        n_basis=n_basis, density_shift=float(density_shift),
        distance_scale=float(distance_scale), white_bg=white_bg,
        acc_dtype=acc_dtype)

    blk = tile * S
    grid = (B // tile,)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, C4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n_basis), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rt, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * n_basis), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
        interpret=interpret,
    )(rows, xn, yn, zn, tn, valid, cs[0], cs[1], cs[2],
      csh[0], csh[1], csh[2], dists, shb, time_table, wb)
    return out
