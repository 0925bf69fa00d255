"""Pack-build Pallas kernel: the channels-first eval embedding tail in
ONE kernel (round-3b; reference behavior held fixed:
nlf/embedding/ray.py:300-363 field split/activations + nlf/intersect/
z.py:77-97 + nlf/intersect/base.py:142-259 sort/mask driver +
nlf/embedding/point.py:741-834 advect + point_offset, and the
normalize_coord step of nlf/nets/tensorf_dynamic.py:645-700).

Consumes the prediction MLP's channels-first output in FIELD-MAJOR row
order (row = channel*S + s — the MLP's last layer columns are permuted
at trace time, models/fused_eval.py _mlp_cf) plus an [8, B] per-ray row
pack, and emits, directly in the shade kernel's S-major block order:

  * the [16, N] scalar pack (ops/pallas/shade.py layout), and
  * up to three [N] int32 quad-table gather indices (one per active
    plane axis) packed as the rows of an [8, N] int32 output.

Everything in between happens on-chip: per-field activations (the
registry closures from models/activations.py are pure jnp and lower in
Mosaic; scheduled ones read a traced `it` shipped via SMEM), z
processing, ray distances, the values-only bitonic z-sort as sublane
rolls, first-k compaction, scene contraction (bbox/mipnerf via
Contract.contract_rows — elementwise + cross-row sums, reference
nlf/intersect/base.py:242-246), flow advection, point offsets, aabb
normalization, and the floor/clip index math of the packed quad-table
gather (ops/grid_sample.py:269-283).

This replaces ~10 ms/262144-ray chunk of XLA glue (field-extraction
reduces, [S,nb,tile] block-reorder copies, pack concat, the XLA sort
ladder — PERFORMANCE.md round-3 trace). Measured constructs:
experiments/exp_pallas_probe5.py / probe6 (strided sublane slices do
NOT lower — hence the field-major permutation; [S,T]->[1,S*T] reshapes,
sublane rolls, int32 outputs, SMEM scalars, 16-row concats all do).

Eval-only (no VJP).
"""

import functools
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperreel_tpu.ops.pallas.shade import PACK_ROWS

# activation cfg types whose registry closures are Mosaic-lowerable
# (elementwise exp/tanh/abs/min/max/select only); ease/interp recurse
_SAFE_ACTS = {"identity", "sigmoid", "tanh", "softplus", "relu",
              "leaky_relu", "abs", "zero", "identity_tanh", "row_l2_norm"}


def act_cfg_supported(cfg):
    """True when get_activation(cfg) lowers inside a Mosaic kernel."""
    if cfg is None:
        return True
    if isinstance(cfg, str):
        return cfg in _SAFE_ACTS
    t = cfg.get("type", "identity")
    if t in ("ease_value", "interp_value"):
        inner = [cfg.get("activation")] if t == "ease_value" else \
            [cfg.get("activation"), cfg.get("activation2")]
        return all(act_cfg_supported(c) for c in inner)
    return t in _SAFE_ACTS


def _bitonic_sublane(v, n):
    """Values-only ascending bitonic sort along sublanes of [n, T]
    (n a power of two) via circular rolls + iota masks — the CF sort of
    models/fused_eval.py _cf_bitonic_sort, in-kernel."""
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            up = pltpu.roll(v, n - j, 0)      # partner for the low half
            dn = pltpu.roll(v, j, 0)          # partner for the high half
            lo_half = (idx & j) == 0
            partner = jnp.where(lo_half, up, dn)
            take_min = ((idx & k) == 0) == lo_half
            v = jnp.where(take_min, jnp.minimum(v, partner),
                          jnp.maximum(v, partner))
            j //= 2
        k *= 2
    return v


def _mlp_rows(x0_ref, wrefs, spec, ctx, T):
    """The prediction MLP inside the kernel (HYPERREEL_PK_MLP): per
    ray-tile [cin, T] -> [P*S, T] f32 with ALL inter-layer activations
    VMEM-resident. The XLA MLP materialized every [256, B] layer
    activation in HBM (~2.1 GB/chunk of inter-layer traffic) plus the
    f32 [480, B] boundary write the pack kernel re-read (fusion.4
    0.94 + fusion.8 0.60 + act selects 0.87 ms/chunk — round-5
    fused_glue_r8c trace). Weights live in VMEM via constant-index
    BlockSpecs (~1.2 MB bf16 total; Pallas keeps constant blocks
    resident across grid steps).

    Bias rides the MXU: each layer's weight is augmented with the bias
    as an extra input ROW and the activation vector with a ones row —
    no [out, T] broadcast needed. One bf16 rounding per layer (the
    dot-operand cast), f32 accumulation inside each dot, and the LAST
    layer stays f32 (un-rounded accumulation — the round-4b pack-input
    precision contract). Mirrors models/fused_eval._mlp_cf under
    --xla_allow_excess_precision (the flag the compile env sets)."""
    m = spec.mlp
    x0 = x0_ref[:].astype(jnp.float32)          # [cin_pad, T] (zero pad)
    ones = jnp.ones((1, T), jnp.float32)
    zpad = jnp.zeros((7, T), jnp.float32)

    def aug(v):
        # [in, T] -> [in + 8, T]: ones row (bias) + 7 zero rows (the
        # weight arrays are row-padded to the matching multiple of 8)
        return jnp.concatenate([v, ones, zpad], 0)

    def dot(w_ref, v):
        return jax.lax.dot_general(
            w_ref[:].astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    h = x0
    ri = 0
    nl = len(m.layout)
    for li, kind in enumerate(m.layout):
        if kind == "skip":
            acc = dot(wrefs[ri], aug(h)) + dot(wrefs[ri + 1], x0)
            ri += 2
        else:
            acc = dot(wrefs[ri], aug(h))
            ri += 1
        h = m.layer_act(acc, ctx) if li < m.act_until else acc
    return h                                     # [P*S, T] f32


def _pack_build_kernel(*refs, spec):
    s = spec
    S, k, T = s.S, s.k, s.tile
    if s.mlp is not None:
        x0_ref = refs[0]
        nw = s.mlp.n_w
        wrefs = refs[1:1 + nw]
        ray_ref, const_ref, it_ref = refs[1 + nw:4 + nw]
        pack_ref = refs[4 + nw]
        idx_refs = refs[5 + nw:]
    else:
        cf_ref, ray_ref, const_ref, it_ref, pack_ref = refs[:5]
        idx_refs = refs[5:]
    ctx = SimpleNamespace(it=it_ref[0], training=False)
    if s.mlp is not None:
        cf_val = _mlp_rows(x0_ref, wrefs, s, ctx, T)

    def cf_rows(r0, n_rows):
        if s.mlp is not None:
            return cf_val[r0:r0 + n_rows]
        # bf16 inputs (lossless storage of the bf16-valued MLP output —
        # fused_eval._mlp_cf keep_dtype) upcast on load; math stays f32
        return cf_ref[r0:r0 + n_rows].astype(jnp.float32)

    def substride(rows):
        """Positional rows[::stride] of [S, T] via a sublane->lane merge
        + CONTIGUOUS lane slice (strided sublane slices don't lower in
        Mosaic; the reshape/slice pair does — exp_pallas_probe8.py)."""
        return rows.reshape(k, s.stride * T)[:, :T]

    def field(name, c, n_rows):
        off, width = s.field_offsets[name]
        assert c < width, (name, c, width)
        r0 = (off + c) * S
        if s.stride is not None and n_rows == k:
            # stride mode: every-stride-th prediction-order row (the
            # reference's inference_samples positional subselection)
            rows = cf_rows(r0, S)
            return substride(s.field_acts[name](rows, ctx))
        rows = cf_rows(r0, n_rows)
        return s.field_acts[name](rows, ctx)

    o2 = ray_ref[2:3]
    d_rows = [ray_ref[3:4], ray_ref[4:5], ray_ref[5:6]]
    dt = ray_ref[6:7]
    tn_ray = ray_ref[7:8]

    # ---- z processing (intersect.py z_plane rows)
    z = field("z_vals", 0, S)
    if s.has_sigma:
        z = s.isect_act(z, ctx) * (1.0 - field("sigma", 0, S))
    else:
        z = s.isect_act(z, ctx)
    z = z * const_ref[:][:, 1:2] + const_ref[:][:, 0:1]
    if s.inv_cdist is not None:
        # anchors live in contracted sample space (process_z_vals,
        # reference nlf/intersect/base.py:128-140)
        z = s.inv_cdist(z)

    dz = jnp.where(jnp.abs(d_rows[2]) < 1e-5, 1e12, d_rows[2])
    dists = (z - o2) / dz
    if s.far_sentinel is not None:
        dists = jnp.where(dists <= 0.0, s.far_sentinel, dists)
    else:
        dists = jnp.where(dists <= 0.0, 0.0, dists)
    if s.stride is not None:
        # positional every-stride-th of the SORTED dists (the legacy CF
        # tail's sel = slice(None, None, S // stride_k))
        dists = substride(_bitonic_sublane(dists, S))         # [k, T]
    else:
        dists = _bitonic_sublane(dists, S)[:k]                # [k, T]

    # ---- base points, then scene contraction (between intersect and
    # advection — reference nlf/intersect/base.py:242-246): contract
    # points AND re-derive distances in contracted space
    p_rows = [ray_ref[c:c + 1] + d_rows[c] * dists for c in range(3)]
    if s.contract_rows is not None:
        mask0 = dists <= 0.0
        pc = s.contract_rows(*p_rows)
        oc = s.contract_rows(ray_ref[0:1], ray_ref[1:2], ray_ref[2:3])
        d_c = jnp.sqrt(jnp.maximum(
            (pc[0] - oc[0]) ** 2 + (pc[1] - oc[1]) ** 2
            + (pc[2] - oc[2]) ** 2, 1e-24))
        dists = jnp.where(mask0, jnp.zeros_like(dists), d_c)
        p_rows = list(pc)

    # ---- advect + point offset (prediction-index order, positional
    # first-k — exactly the CF path's post-sort slicing)
    if s.po_use_sigma:
        psig = field(s.po_sigma_field, 0, k)
        po_fac = 1.0 - psig
    else:
        po_fac = 1.0
    for c in range(3):
        p = p_rows[c]
        if s.has_flow:
            p = p + s.flow_act(field("spatial_flow", c, k), ctx) * dt
        p_rows[c] = p + s.po_act(field("point_offset", c, k), ctx) \
            * po_fac

    xn = (p_rows[0] - s.aabb_lo[0]) * s.aabb_inv[0] - 1.0
    yn = (p_rows[1] - s.aabb_lo[1]) * s.aabb_inv[1] - 1.0
    zn = (p_rows[2] - s.aabb_lo[2]) * s.aabb_inv[2] - 1.0
    comp = (xn, yn, zn)
    zero = jnp.zeros((k, T), jnp.float32)
    tn = tn_ray + zero if s.has_flow else zero

    def crow(name, c):
        if name in s.field_offsets:
            return field(name, c, k)
        return zero

    rows16 = [xn, yn, zn, tn, dists,
              crow("color_scale", 0), crow("color_scale", 1),
              crow("color_scale", 2),
              crow("color_shift", 0), crow("color_shift", 1),
              crow("color_shift", 2),
              d_rows[0] + zero, d_rows[1] + zero, d_rows[2] + zero,
              zero, zero]
    pack_ref[:] = jnp.concatenate(
        [r.reshape(1, k * T) for r in rows16], 0)

    # ---- quad-table gather indices per active axis
    # (matches fused_eval.gather_idx / ops/grid_sample.py quad layout);
    # skipped entirely in patch mode (emit_idx=False): the patch route
    # gathers via patch_anchor_idx, so the s32[8, N] output would be a
    # dead 268 MB/chunk HBM write XLA cannot DCE out of a custom call
    if idx_refs:
        idx_ref = idx_refs[0]
        idx_rows = []
        for (W, H, m0, m1) in s.axis_specs:
            px = (comp[m0] + 1.0) * 0.5 * (W - 1)
            py = (comp[m1] + 1.0) * 0.5 * (H - 1)
            xi = (jnp.clip(jnp.floor(px), -1.0, W - 1.0) + 1.0).astype(
                jnp.int32)
            yi = (jnp.clip(jnp.floor(py), -1.0, H - 1.0) + 1.0).astype(
                jnp.int32)
            idx_rows.append((yi * (W + 1) + xi).reshape(1, k * T))
        izero = jnp.zeros((1, k * T), jnp.int32)
        idx_ref[:] = jnp.concatenate(
            idx_rows + [izero] * (8 - len(idx_rows)), 0)


def pack_build(out_cf_fm, ray_pack, it, *, S, k, tile, samples, z_scale,
               field_offsets, field_acts, isect_act, flow_act, po_act,
               has_sigma, has_flow, po_use_sigma, po_sigma_field,
               far_sentinel, aabb, axis_specs, contract_rows=None,
               inv_cdist=None, stride=None, interpret=None,
               emit_idx=True, mlp=None):
    """Run the pack-build kernel.

    Args:
      out_cf_fm: [P*S, B] f32 field-major channels-first MLP output
                 (row = global_channel*S + s).
      ray_pack:  [8, B] f32 rows: o.xyz, d.xyz, dt, tn (per-ray time
                 coord in [-1, 1]; zeros for static chains).
      it:        traced int32 iteration scalar (scheduled activations).
      S, k:      predicted samples / kept samples (k == S when no
                 first-k compaction; both powers of two).
      tile:      rays per block — MUST equal the shade kernel's tile so
                 the S-major block orders agree.
      field_offsets: {name: (offset, width)} in prediction channels.
      field_acts: {name: act(x, ctx)} registry closures.
      axis_specs: per active axis (W, H, m0, m1) — plane dims + the
                 MAT_MODE component indices feeding px/py.
      far_sentinel: _FAR_SENTINEL for invalid_sort_far chains, else None.
      contract_rows: Contract.contract_rows closure for non-identity
                 scene contractions (ops/contract.py), else None.
      inv_cdist: Contract.inverse_contract_distance closure when
                 contract_samples is set, else None.
      stride: positional subselection stride (k * stride == S, the
                 reference's inference_samples knob); None = first-k.

    Returns (pack [16, N], idx8 [8, N] int32), N = k * B, in S-major
    block order (lane = s*tile + r within each tile*k block). With
    emit_idx=False (the patch-gather route, which never reads idx8)
    the kernel skips the index build + write and returns (pack, None).

    mlp: optional dict {x0 [cin_pad, B] (zero row-padded), w_augs
    (list of row-padded bias-augmented weights, see _mlp_rows),
    layout ("dense"/"skip" per layer), act_until, layer_act} — runs
    the prediction MLP inside the kernel; out_cf_fm is then ignored
    (pass None) and PS comes from the last weight's column count.
    """
    if mlp is not None:
        B = mlp["x0"].shape[1]
        PS = mlp["w_augs"][-1].shape[1]
    else:
        PS, B = out_cf_fm.shape
    assert B % tile == 0, (B, tile)
    assert stride is None or (k * stride == S and stride >= 2), \
        (S, k, stride)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    aabb = np.asarray(aabb, np.float32)
    mspec = None
    if mlp is not None:
        mspec = SimpleNamespace(
            n_w=len(mlp["w_augs"]), layout=tuple(mlp["layout"]),
            act_until=int(mlp["act_until"]), layer_act=mlp["layer_act"])
    spec = SimpleNamespace(
        S=S, k=k, tile=tile, field_offsets=dict(field_offsets),
        field_acts=dict(field_acts), isect_act=isect_act,
        flow_act=flow_act, po_act=po_act, has_sigma=has_sigma,
        has_flow=has_flow, po_use_sigma=po_use_sigma,
        po_sigma_field=po_sigma_field, far_sentinel=far_sentinel,
        contract_rows=contract_rows, inv_cdist=inv_cdist, stride=stride,
        aabb_lo=tuple(float(v) for v in aabb[0]),
        aabb_inv=tuple(float(v) for v in 2.0 / (aabb[1] - aabb[0])),
        axis_specs=tuple(tuple(a) for a in axis_specs), mlp=mspec)
    # [S, 128] per-sample consts: col 0 = samples anchor, col 1 = z_scale
    # ([S, 1] lane-slice broadcast inside the kernel — probe5 #7)
    consts = np.zeros((S, 128), np.float32)
    consts[:, 0] = np.broadcast_to(
        np.asarray(samples, np.float32).reshape(-1), (S,))
    consts[:, 1] = np.broadcast_to(
        np.asarray(z_scale, np.float32).reshape(-1), (S,))
    kern = functools.partial(_pack_build_kernel, spec=spec)
    blk = k * tile
    grid = (B // tile,)
    if mlp is not None:
        # x0 streams per ray tile; weights are whole-array constant
        # blocks (fetched once, kept VMEM-resident across grid steps)
        first_specs = [
            pl.BlockSpec((mlp["x0"].shape[0], tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for w in mlp["w_augs"]
        ]
        first_args = [mlp["x0"]] + list(mlp["w_augs"])
    else:
        first_specs = [pl.BlockSpec((PS, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)]
        first_args = [out_cf_fm]
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=first_specs + [
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((PACK_ROWS, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((8, blk), lambda i: (0, i),
                           memory_space=pltpu.VMEM)] if emit_idx else []),
        out_shape=[
            jax.ShapeDtypeStruct((PACK_ROWS, k * B), jnp.float32),
        ] + ([jax.ShapeDtypeStruct((8, k * B), jnp.int32)]
             if emit_idx else []),
        interpret=interpret,
    )(*first_args, ray_pack, jnp.asarray(consts),
      jnp.asarray(it, jnp.int32).reshape(1))
    return (outs[0], outs[1]) if emit_idx else (outs[0], None)
