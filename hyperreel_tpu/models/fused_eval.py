"""Channels-first fused EVAL pipeline for the flagship dynamic model
(round-3 design, CLAUDE.md sketch; reference behavior held fixed:
nlf/embedding/ray.py:213-394 + nlf/intersect/z.py + embedding/point.py
advect/point_offset + nlf/nets/tensorf_dynamic.py:645-839).

Why: the general eval path keeps every per-sample field in ray-major
[B, S, C] layout; on TPU that costs ~10-15 ms/262144-ray chunk of pure
relayout glue (MLP-out [B,480]->[B,32,15] copies, sort-adjacent layout
copies, component-extraction reduces — PERFORMANCE.md round-2 trace).
Here the ENTIRE embedding runs channels-first — [S, B] rows with the ray
axis on TPU lanes — from a transposed MLP onward:

  * the prediction MLP computes [C, B] activations (weights transposed at
    trace time; MXU shapes unchanged), so per-field-per-z rows are
    contiguous major-axis slices, not reshape/copy pairs;
  * the z-sort is a bitonic network on the LEADING axis — every pass's
    [m, 2, j, B] regroup is a leading-axis reshape (free) over full
    128-lane rows;
  * point math (o + d*t, flow advection, point offsets, aabb
    normalization) is pure row arithmetic — no [N, 3] tensors exist;
  * ONE batched relayout converts to the Pallas kernel's ray-major lane
    world: the [16, S, B] scalar pack transposes to [16, B*S] and the
    gather index [S, B] to [B*S]; the space-table gather then lands rows
    already in kernel block order. The kernel (ops/pallas/shade.py) is
    unchanged.

Training and non-flagship configs keep the general path; eligibility is
checked structurally at build time and per-call (mirrors
TensorVMKeyframeTime._fused_ok). Parity vs the general path is enforced
by tests/test_fused_cf.py at ~1e-4.
"""

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.models.activations import get_activation
from hyperreel_tpu.ops.pallas.shade import kmajor_perm as _kmajor_perm


def _stage_cfgs(model):
    return {name: stage for name, stage in model.embedding.stages}


def cf_eligible(model):
    """Structural eligibility: the technicolor_z_plane-family chain."""
    try:
        stages = _stage_cfgs(model)
        names = [n for n, _ in model.embedding.stages]
        dyn = ["ray_prediction_0", "ray_intersect_0", "flow_0",
               "point_offset_0", "add_point_outputs_0", "extract_fields"]
        sta = [n for n in dyn if n != "flow_0"]
        accepted = []
        for want in (dyn, sta):
            # the reference's inference_samples stride knob
            # (with_inference_samples) sits after point_offset; the
            # stride slice is POSITIONAL, so it commutes past the
            # elementwise per-sample stages to just after the sort
            i_po = want.index("point_offset_0") + 1
            accepted += [want,
                         want[:2] + ["select_points_compact"] + want[2:],
                         want[:i_po] + ["select_points_inference"]
                         + want[i_po:]]
        if names not in accepted:
            return False
        is_dynamic = "flow_0" in names
        from hyperreel_tpu.models.tensorf import (
            TensorVMKeyframeTime, TensorVMNoSample)
        if is_dynamic and not isinstance(model.color_net,
                                         TensorVMKeyframeTime):
            return False
        if not is_dynamic:
            if not isinstance(model.color_net, TensorVMNoSample) or \
                    isinstance(model.color_net, TensorVMKeyframeTime):
                return False
            # static weights come from weight_fn (none here -> ones)
            # and density features multiply by them pre-relu; with no
            # weight_fn the multiply is identity
        if "select_points_compact" in names:
            sel = stages["select_points_compact"]
            k = sel.inference_samples
            if sel.mode != "first" or not k or (k & (k - 1)):
                return False
            if not stages["ray_intersect_0"].intersect.invalid_sort_far:
                return False
        if "select_points_inference" in names:
            sel = stages["select_points_inference"]
            k = sel.inference_samples
            S = stages["ray_prediction_0"].z_channels
            if sel.mode != "stride" or not k or (k & (k - 1)) \
                    or k >= S or S % k:
                return False
        for _, st in model.embedding.stages:
            cfg = getattr(st, "cfg", None)
            if isinstance(cfg, dict) and (
                    cfg.get("wait_iters") or cfg.get("stop_iters")):
                return False
        if model.ray_param.name != "identity":
            return False
        pred = stages["ray_prediction_0"]
        if pred.total_ray_out != 0:
            return False
        from hyperreel_tpu.models.mlp import BaseMLP
        if not isinstance(pred.net, BaseMLP) or pred.net.pe_cfg:
            return False
        if pred.net.activation != "identity":
            return False
        isect = stages["ray_intersect_0"].intersect
        icfg = isect.cfg
        if icfg.get("type") != "z_plane":
            return False
        if not isect.sort or isect.sort_outputs or isect.weight_fn:
            return False
        if (isect.use_disparity or isect.normalize or isect.clamp
                or isect.residual_z or isect.residual_distance
                or isect.use_local_prediction):
            return False
        # contraction: allowed when a channels-first form exists
        # (identity / mipnerf — ops/contract.py contract_points_cf) and
        # never scheduled off; the far-sort sentinel is incompatible
        # (a sentinel point CONTRACTS onto the radius-2 sphere, which
        # the aabb validity mask would not exclude)
        if isect.contract.name != "identity":
            if isect.contract.contract_points_cf is None:
                return False
            if isect.invalid_sort_far:
                return False
            if isect.contract_stop_iters != float("inf"):
                return False
        if np.any(isect.origin != 0.0):
            return False
        if not (isect.near == 0.0 and isect.far == float("inf")):
            return False
        if isect.mask_stop_iters != float("inf"):
            return False
        if is_dynamic:
            flow = stages["flow_0"]
            if flow.use_angular_flow or not flow.use_spatial_flow:
                return False
            if "spatial_flow" not in pred.output_names:
                return False
        po = stages["point_offset_0"]
        if po.use_sigma and po.in_density_field not in pred.output_names:
            return False
        if "point_offset" not in pred.output_names:
            return False
        net = model.color_net
        if not getattr(net, "_fused_eligible", False) or \
                not getattr(net, "fused_render", False):
            return False
        # sample count: bitonic leading-axis sort wants a power of two
        S = pred.z_channels
        if S & (S - 1):
            return False
        return True
    except (KeyError, AttributeError):
        return False


def _rows_of(mat, n_cols):
    """Extract the columns of [B, C] as a list of [B] rows via one-hot
    reduces (a plain [B, C] -> [C, B] transpose lowers to a pathological
    while-loop for small C — PERFORMANCE.md round-1 notes)."""
    e = jnp.eye(n_cols, dtype=mat.dtype)
    return [jnp.einsum("bc,c->b", mat, e[c]) for c in range(n_cols)]


def _cf_bitonic_sort(x):
    """Values-only ascending bitonic sort along the LEADING axis of
    [S, B] (S a power of two). Mirrors ops/sort_network.py but with
    leading-axis regroups, which are layout-free, and full-lane rows."""
    S, B = x.shape
    k = 2
    while k <= S:
        j = k // 2
        while j >= 1:
            m = S // (2 * j)
            y = x.reshape(m, 2, j, B)
            a, b = y[:, 0], y[:, 1]
            base = np.arange(m) * (2 * j)
            asc = jnp.asarray((base & k) == 0)[:, None, None]
            lo = jnp.minimum(a, b)
            hi = jnp.maximum(a, b)
            na = jnp.where(asc, lo, hi)
            nb = jnp.where(asc, hi, lo)
            x = jnp.stack([na, nb], 1).reshape(S, B)
            j //= 2
        k *= 2
    return x


@dataclass
class FusedCFEval:
    """Compiled-fast-path evaluator bound to one LightfieldModel."""

    model: object

    def __post_init__(self):
        stages = _stage_cfgs(self.model)
        self.pred = stages["ray_prediction_0"]
        self.isect = stages["ray_intersect_0"].intersect
        self.flow = stages.get("flow_0")      # None for static chains
        self.po = stages["point_offset_0"]
        self.net = self.model.color_net
        self.S = self.pred.z_channels
        # post-sort first-k compaction (select_points mode="first"
        # paired with intersect invalid_sort_far)
        sel = stages.get("select_points_compact")
        self.compact_k = sel.inference_samples if sel is not None else None
        # positional stride subselection (the reference's
        # inference_samples knob via with_inference_samples)
        sel = stages.get("select_points_inference")
        self.stride_k = sel.inference_samples if sel is not None else None
        p = self.pred
        self.field_offsets = {}
        off = 0
        for name, width in zip(p.output_names, p.output_shapes):
            self.field_offsets[name] = (off, width)
            off += width
        self.preds = p.preds_per_z
        # pack-build kernel eligibility (ops/pallas/pack_build.py): the
        # embedding tail runs in ONE Pallas kernel when every activation
        # in the chain lowers in Mosaic and any scene contraction has a
        # rows form (bbox/mipnerf Contract.contract_rows — elementwise,
        # lowers in-kernel). Stride subselection rides the kernel via a
        # sublane->lane merge + contiguous lane slice when the stride is
        # a power of two (exp_pallas_probe8.py) — checked per-apply
        # where S is known.
        from hyperreel_tpu.ops.pallas.pack_build import act_cfg_supported
        outs = p.cfg["outputs"]
        acts_ok = all(act_cfg_supported(o.get("activation"))
                      for o in outs.values())
        acts_ok = acts_ok and act_cfg_supported(
            self.isect.cfg.get("activation"))
        acts_ok = acts_ok and act_cfg_supported(
            self.po.cfg.get("activation", "identity"))
        if self.flow is not None:
            acts_ok = acts_ok and act_cfg_supported(
                self.flow.cfg.get("spatial_flow_activation", "identity"))
        contract_ok = (self.isect.contract.name == "identity"
                       or self.isect.contract.contract_rows is not None)
        self._pack_ok = acts_ok and contract_ok
        # coherent patch-gather (ops/patch_gather.py + pallas/patch_blend):
        # opt-in [px, py]; EXACT only for scanline-coherent ray batches
        # whose 4-ray block footprints fit the patch (frame renders at
        # high pixel density — exp_patch_coverage*.py); degrades to
        # zero features per out-of-patch corner otherwise
        pc = self.net.cfg.get("coherent_gather")
        self.patch_cfg = (int(pc[0]), int(pc[1])) if pc else None
        # coherent block size R: rays per gathered patch row (4
        # default; 8 halves the gather rows again — the per-row rate
        # is flat in row bytes, gather_align.log — at the price of a
        # wider patch for coverage). R=8 rides the dyn1 fused
        # blend+shade route only (the two-kernel blend stays R=4).
        self.patch_block = int(pc[2]) if pc and len(pc) > 2 else 4

    # -- channels-first MLP -------------------------------------------------

    def _mlp_cf(self, params, net_in_cf, ctx, field_major=False,
                keep_dtype=False):
        """BaseMLP.apply with [C, B] activations (same math, transposed
        weights; mirrors models/mlp.py BaseMLP.apply).

        field_major: permute the LAST layer's output channels from the
        z-major order (row = s*preds + c) to field-major (row =
        c*S + s) — a trace-time weight/bias column permutation, so the
        pack-build kernel (ops/pallas/pack_build.py) can extract field
        rows as contiguous sublane slices (strided sublane slices do
        not lower in Mosaic — exp_pallas_probe5.py).

        keep_dtype: skip the final f32 upcast. With compute_dtype=bf16
        the output rows are bf16-VALUED either way (bf16 matmul output
        — the round-4 bf16-tail A/B measured delta exactly 0.0), so a
        bf16-stored kernel input is lossless by construction and halves
        the [P*S, B] HBM write+read at the MLP/pack-kernel boundary."""
        net = self.pred.net
        cd = net.compute_dtype
        x = net_in_cf
        input_x = x
        act_until = net.depth if net.linear_last else net.depth + 1
        last = net.depth + 1
        perm = np.arange(self.S * self.preds).reshape(
            self.S, self.preds).T.reshape(-1) if field_major else None
        skip_split = os.environ.get(
            "HYPERREEL_MLP_SKIP_SPLIT", "1") != "0"
        for i in range(net.depth + 2):
            skip = i in net.skips
            if skip and not skip_split:
                x = jnp.concatenate([input_x.astype(x.dtype), x], 0)
            p = params[f"layer_{i}"]
            w = p["w"]
            b = p.get("b")
            if i == last and perm is not None:
                w = w[:, perm]
                b = None if b is None else b[perm]
            if cd is not None:
                x = x.astype(cd)
                w = w.astype(cd)
            if skip and skip_split:
                # SKIP-SPLIT: w.T @ [input_x; x] == w[:ci].T @ input_x
                # + w[ci:].T @ x (trace-time weight split). The concat
                # materialized a [Cin+hidden, B] activation buffer
                # (concatenate.7, 0.83 ms/chunk at bench scale — round-5
                # fused_glue trace) and left the next matmul with a
                # ragged 265-row contraction; the split keeps the hot
                # matmul at [hidden, hidden] and folds the tiny input
                # term in as an f32 add. Accumulation is f32 either way
                # (one bf16 round-off at the end, same as the fused
                # matmul) — only f32 reassociation-level divergence.
                ci = input_x.shape[0]
                xi = input_x.astype(x.dtype)
                acc = jax.lax.dot_general(
                    w[ci:], x, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + jax.lax.dot_general(
                    w[:ci], xi, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                x = acc.astype(x.dtype)
            else:
                x = w.T @ x
            if b is not None:
                x = x + b.astype(x.dtype)[:, None]
            if i < act_until:
                x = net.layer_act(x, ctx)
        # HYPERREEL_BF16_TAIL=sim: round the CF rows (z offsets, point
        # coords, field acts inputs) through bf16 to measure the
        # PRECISION cost of a bf16 embedding tail without kernel dtype
        # work — the bandwidth upside is bounded by the pack-build
        # kernel's I/O share (~2.65 ms of a 23.4 ms chunk, so <= ~1.3
        # ms; tables/gathers are bf16 already). See exp_bf16_tail.py.
        if os.environ.get("HYPERREEL_BF16_TAIL") == "sim":
            x = x.astype(jnp.bfloat16)
        if keep_dtype:
            return x
        return x.astype(jnp.float32)

    def _mlp_kernel_spec(self, params, net_in_cf):
        """Trace-time weight prep for the IN-KERNEL prediction MLP
        (ops/pallas/pack_build.py _mlp_rows; HYPERREEL_PK_MLP).

        Per layer the weight is augmented with the bias as an extra
        input ROW (the kernel appends a ones row to the activation, so
        the bias rides the MXU — no [out, T] broadcast in Mosaic) plus
        zero rows up to the sublane multiple of 8. The skip layer
        splits into (main+bias, input-term) like the XLA skip-split.
        The LAST layer's columns carry the field-major permutation
        (same trace-time trick as _mlp_cf field_major)."""
        net = self.pred.net
        last = net.depth + 1
        perm = np.arange(self.S * self.preds).reshape(
            self.S, self.preds).T.reshape(-1)
        cin = net_in_cf.shape[0]
        cin_pad = -(-cin // 8) * 8
        x0 = jnp.pad(net_in_cf.astype(jnp.bfloat16),
                     ((0, cin_pad - cin), (0, 0)))

        def aug(w, b, d_pad):
            # rows: [w (padded to d_pad); bias; 7 zeros] -> d_pad + 8
            z1 = jnp.zeros((d_pad - w.shape[0], w.shape[1]), w.dtype)
            z7 = jnp.zeros((7, w.shape[1]), w.dtype)
            return jnp.concatenate(
                [w, z1, b[None, :], z7], 0).astype(jnp.bfloat16)

        w_augs, layout = [], []
        for i in range(net.depth + 2):
            p = params[f"layer_{i}"]
            w = p["w"].astype(jnp.float32)
            b = p.get("b")
            b = jnp.zeros((w.shape[1],), jnp.float32) if b is None \
                else b.astype(jnp.float32)
            if i == last:
                w = w[:, perm]
                b = b[perm]
            if i in net.skips:
                w_in = jnp.pad(w[:cin].astype(jnp.bfloat16),
                               ((0, cin_pad - cin), (0, 0)))
                w_augs += [aug(w[cin:], b, w.shape[0] - cin), w_in]
                layout.append("skip")
            else:
                d_pad = cin_pad if i == 0 else w.shape[0]
                w_augs.append(aug(w, b, d_pad))
                layout.append("dense")
        return {"x0": x0, "w_augs": w_augs, "layout": layout,
                "act_until": net.depth if net.linear_last
                else net.depth + 1,
                "layer_act": net.layer_act}

    # -- render plan --------------------------------------------------------

    def _plan_meta(self, cparams):
        """Static (shape-derived) render plan: per-axis plane dims +
        MAT_MODE components, second-factor dims, the pick_tile scratch
        estimate. No array math — safe to call per trace."""
        net = self.net
        dyn1 = self.flow is not None and len(net.active_density) == 1
        if dyn1:
            sd = cparams["density"]["space_0"]
            C = sd.shape[-1] + cparams["app"]["space_0"].shape[-1]
            H, W = sd.shape[0], sd.shape[1]
            TH, TW = cparams["density"]["time_0"].shape[:2]
            twp = ((TW + 2 + 127) // 128) * 128
            return {"dyn1": True, "C": C, "nd": net.density_n_comp[0],
                    "TW": TW, "TH": TH, "twp": twp,
                    "axis_specs": [(W, H, 0, 1)],
                    "scratch": twp * 6 + (TH + 2) * C * 4,
                    # uniform-time premix shrinks the kernel's time
                    # table (TH+2)x -> the VMEM budget follows
                    "scratch_ut": twp * 6 + C * 4}
        from hyperreel_tpu.models.tensorf import MAT_MODE, MAT_MODE_SPACE
        dynamic = self.flow is not None
        axis_specs, line_lens, time_hs = [], [], []
        dens_c, app_c = [], []
        scratch = 0
        scratch_ut = 0
        scratch_axes = []
        for i in net.active_density:
            fam = "space" if dynamic else "plane"
            pd = cparams["density"][f"{fam}_{i}"]
            C_a = pd.shape[-1] + cparams["app"][f"{fam}_{i}"].shape[-1]
            H, W = pd.shape[0], pd.shape[1]
            m0, m1 = (MAT_MODE_SPACE if dynamic else MAT_MODE)[i]
            axis_specs.append((W, H, m0, m1))
            if dynamic:
                TH, TW = cparams["density"][f"time_{i}"].shape[:2]
                twp = ((TW + 2 + 127) // 128) * 128
                line_lens.append(TW)
                time_hs.append(TH)
                sa = twp * 6 + (TH + 2) * C_a * 4
                sa_ut = twp * 6 + C_a * 4
            else:
                L = cparams["density"][f"line_{i}"].shape[0]
                lp = ((L + 2 + 127) // 128) * 128
                line_lens.append(L)
                time_hs.append(0)
                sa = lp * 6 + C_a * 4
                sa_ut = sa
            scratch += sa
            scratch_ut += sa_ut
            scratch_axes.append(sa)
            dens_c.append(net.density_n_comp[i])
            app_c.append(net.app_n_comp[i])
        return {"dyn1": False, "axis_specs": axis_specs,
                "line_lens": line_lens, "time_hs": time_hs,
                "dens_c": dens_c, "app_c": app_c, "scratch": scratch,
                "scratch_ut": scratch_ut, "scratch_axes": scratch_axes}

    def _plan_arrays(self, cparams):
        """The per-CHECKPOINT table arrays of the render plan:

          * per-axis quad-corner packed space/plane tables (bf16; all
            4 bilinear corners of a texel in one gatherable row),
          * per-axis second factors (ring-padded time planes for
            dynamic nets, ring-padded lines for static VM),
          * the transposed basis matrix.

        apply() rebuilds these inside the traced frame by default (XLA
        hoists them out of lax.map chunk loops); serving paths call
        prepare() once per checkpoint and ship the result via
        render_kwargs["cf_prepared"] so compiled frames skip the
        rebuild entirely."""
        net = self.net
        meta = self._plan_meta(cparams)

        def quad_table(plane):
            Hh, Ww, Cc = plane.shape
            tbl = jnp.pad(plane.astype(jnp.bfloat16),
                          ((1, 1), (1, 1), (0, 0)))
            qp = jnp.concatenate(
                [tbl[:-1, :-1], tbl[:-1, 1:], tbl[1:, :-1], tbl[1:, 1:]],
                -1)
            return qp.reshape((Hh + 1) * (Ww + 1), 4 * Cc)

        if meta["dyn1"]:
            # dynamic single-axis: space plane x time plane (the
            # flagship's measured-optimal path)
            space = jnp.concatenate(
                [cparams["density"]["space_0"], cparams["app"]["space_0"]],
                -1)
            C, nd = meta["C"], meta["nd"]
            TH, TW, twp = meta["TH"], meta["TW"], meta["twp"]
            timep = jnp.concatenate(
                [cparams["density"]["time_0"], cparams["app"]["time_0"]],
                -1)
            tp = jnp.pad(timep.astype(jnp.float32),
                         ((1, 1), (1, 1), (0, 0)))
            ttab_t = jnp.pad(
                jnp.moveaxis(tp, -1, 1).reshape((TH + 2) * C, TW + 2),
                ((0, 0), (0, twp - (TW + 2))))
            w = cparams["basis_mat"]["w"].astype(jnp.float32)
            wb_t = jnp.concatenate(
                [jnp.zeros((w.shape[1], nd), jnp.float32), w.T], 1)
            wb_t = wb_t[_kmajor_perm(wb_t.shape[0])]
            if self.patch_cfg is not None:
                from hyperreel_tpu.ops.patch_gather import (
                    build_patch_table_2d)
                ptab = build_patch_table_2d(
                    space.astype(jnp.bfloat16), *self.patch_cfg)
                return [quad_table(space)], [ttab_t], wb_t, [ptab]
            return [quad_table(space)], [ttab_t], wb_t

        # per-axis multi: static plane x line, or dynamic-multi space
        # plane x time plane (time_hs > 0). Static weight_fn is
        # rejected by eligibility so weights == 1 and the pre-relu
        # multiply is identity.
        dynamic = self.flow is not None
        tables, second = [], []
        for a, i in enumerate(net.active_density):
            fam = "space" if dynamic else "plane"
            plane = jnp.concatenate(
                [cparams["density"][f"{fam}_{i}"],
                 cparams["app"][f"{fam}_{i}"]], -1)
            tables.append(quad_table(plane))
            C_a = plane.shape[-1]
            if dynamic:
                timep = jnp.concatenate(
                    [cparams["density"][f"time_{i}"],
                     cparams["app"][f"time_{i}"]], -1)
                TH, TW = meta["time_hs"][a], meta["line_lens"][a]
                twp = ((TW + 2 + 127) // 128) * 128
                tp2 = jnp.pad(timep.astype(jnp.float32),
                              ((1, 1), (1, 1), (0, 0)))
                second.append(jnp.pad(
                    jnp.moveaxis(tp2, -1, 1).reshape(
                        (TH + 2) * C_a, TW + 2),
                    ((0, 0), (0, twp - (TW + 2)))))
            else:
                line = jnp.concatenate(
                    [cparams["density"][f"line_{i}"],
                     cparams["app"][f"line_{i}"]], -1)
                L = line.shape[0]
                lp = ((L + 2 + 127) // 128) * 128
                second.append(jnp.pad(
                    line.astype(jnp.float32).T,
                    ((0, 0), (1, lp - L - 1))))
        wb_t = cparams["basis_mat"]["w"].astype(jnp.float32).T
        wb_t = wb_t[_kmajor_perm(wb_t.shape[0])]
        if self.patch_cfg is not None:
            from hyperreel_tpu.ops.patch_gather import build_patch_table_2d
            ptabs = []
            for i in net.active_density:
                fam = "space" if dynamic else "plane"
                plane = jnp.concatenate(
                    [cparams["density"][f"{fam}_{i}"],
                     cparams["app"][f"{fam}_{i}"]], -1)
                ptabs.append(build_patch_table_2d(
                    plane.astype(jnp.bfloat16), *self.patch_cfg))
            return tables, second, wb_t, ptabs
        return tables, second, wb_t

    def prepare(self, params):
        """Prebuild the per-checkpoint table arrays for serving. Pass
        the result to apply via render_kwargs["cf_prepared"] (as jit
        ARGUMENTS, not closure constants) so each compiled frame skips
        the table rebuild."""
        return jax.jit(self._plan_arrays)(params["color"])

    # -- forward ------------------------------------------------------------

    def ok(self, ctx, render_kwargs):
        """Per-call gate (mirrors TensorVMKeyframeTime._fused_ok; the
        structural `color_transform` check is covered by cf_eligible)."""
        if ctx.training:
            return False
        net = self.net
        if not (net.fused_render and net._fused_eligible):
            return False
        rk = render_kwargs or {}
        if any(f != "distances" for f in rk.get("fields", [])):
            return False
        if rk.get("pred_weights_fields") or rk.get("no_over_fields"):
            return False
        return True

    def apply(self, params, rays, ctx, render_kwargs=None):
        from hyperreel_tpu.ops.pallas.shade import (
            fused_shade_composite, build_scalar_pack)

        render_kwargs = render_kwargs or {}
        S = self.S
        B = rays.shape[0]
        eparams = params["embedding"]
        cparams = params["color"]

        # ---- trace-time plan: quad/line tables, per-axis specs, tile.
        # Built BEFORE the embedding so the pack-kernel decision (which
        # changes the MLP output ordering) can depend on the tile.
        # Split into static meta (_plan_meta, shape-derived) + table
        # arrays (_plan_arrays) so a serving path can prebuild the
        # arrays ONCE per checkpoint (prepare(); the viewer ships them
        # via render_kwargs["cf_prepared"]) instead of rebuilding them
        # inside every compiled frame.
        net = self.net
        S_shade = self.stride_k or self.compact_k or S
        n_basis = (net._sh_deg + 1) ** 2 \
            if net.shading_mode == "SH" else 1
        shading = "sh" if net.shading_mode == "SH" else "rgb"

        def pick_tile(scratch):
            # HYPERREEL_EVAL_TILE overrides the VMEM heuristic.
            # Cap provenance (round-4 exp_multiaxis_tile, real TPU):
            # llff-class multi-axis static at tile=128 is 16.25 MB-units
            # (128*32*3968), COMPILES and runs 1.46x faster than tile=64;
            # n3d-class dynamic z=64 is 31.5 MB-units (128*64*3840) and
            # FAILS Mosaic compile. 17 MB admits the verified llff point
            # with maximal margin below the verified failure.
            force = os.environ.get("HYPERREEL_EVAL_TILE")
            if force and B % int(force) == 0:
                return int(force)
            tile = 128
            while tile > 1 and (B % tile != 0
                                or tile * S_shade * scratch
                                > 17 * (1 << 20)):
                tile //= 2
            return tile

        meta = self._plan_meta(cparams)
        dyn1 = meta["dyn1"]
        prepared = render_kwargs.get("cf_prepared")
        if prepared is None:
            prepared = self._plan_arrays(cparams)
        ptabs = None
        if len(prepared) == 4:
            tables, second, wb_t, ptabs = prepared
        else:
            tables, second, wb_t = prepared
        axis_specs = meta["axis_specs"]
        tabs = [(tables[i], w, h)
                for i, (w, h, _, _) in enumerate(axis_specs)]
        if dyn1:
            C, nd = meta["C"], meta["nd"]
            TW, TH = meta["TW"], meta["TH"]
            ttab_t = second[0]
        else:
            line_tabs = second
            grid_dims = [(w, h) for (w, h, _, _) in axis_specs]
            line_lens = meta["line_lens"]
            time_hs = meta["time_hs"]
            dens_c, app_c = meta["dens_c"], meta["app_c"]
        # uniform-time premix (see below): hoisted here because the
        # premixed time table is (TH+2)x smaller, which changes BOTH
        # VMEM budgets (kernel scratch + the fused-patch fp_lane) and
        # can keep tile=128 (the pack-build kernel's requirement)
        # where the un-premixed estimate would shrink the tile.
        uniform_t = bool(render_kwargs.get("uniform_time")) \
            and self.flow is not None
        tile = pick_tile(meta["scratch_ut" if uniform_t
                              else "scratch"])
        # coherent patch-gather: rays are PERMUTED at chunk entry
        # (original ray 4j+p -> position p*B/4 + j) so each phase is a
        # contiguous quarter of the flat kernel order; quarters must be
        # whole tile-blocks, so shrink the tile until 4*tile | B
        patch = None
        # rays_phase_major: the CALLER already delivers rays in the
        # phase-major order (original ray 4j+p at position p*B/4 + j —
        # a free host-side reindex at ray generation) and accepts
        # outputs in that order, so both in-graph permutation copies
        # (~0.45 ms each per chunk on HW: the [B//4,4,D] transposes
        # lower to while-loops) drop out. Rays are order-independent
        # everywhere else, so if patch routing falls through the flag
        # is a no-op (output order always matches input order).
        pm_rays = bool(render_kwargs.get("rays_phase_major"))
        # coherent block size: R=8 halves the patch-gather rows again
        # but only the dyn1 fused blend+shade kernel takes R blocks
        # (the two-kernel blend route stays R=4), so R=8 engages only
        # when that route structurally will
        fuse_env = os.environ.get(
            "HYPERREEL_FUSED_PATCH", "1") not in ("0", "false")
        Rb = 4
        if self.patch_block == 8:
            # all four patch routes take R blocks: the fused kernels
            # (dyn1 AND multi-axis) shade R phases per J-block; the
            # two-kernel routes blend [R*C_a, J] and the shade reads
            # R phase row-blocks (phase_major). R=8 halves the per-row
            # gather floor again at the price of a wider patch for
            # coverage (the in-graph witness gates exactness).
            Rb = 8
        # STRUCTURAL SUBLANE GATE (HW-found, verify_r8_multi2.log):
        # the phase_major rows BlockSpec is (C_a, blk) and Pallas TPU
        # requires the sublane block dim divisible by 8 (C_a = 8 is
        # HW-proven — the llff/n3d presets' smallest axis). Sub-preset
        # channel counts (e.g. [4,2,2] -> C_a 4) crash the remote
        # compile, so the patch route structurally falls back to the
        # exact quad path for them instead.
        if self.patch_cfg is not None:
            if dyn1:
                cs_gate = [meta["C"]]
            else:
                cs_gate = [meta["dens_c"][a] + meta["app_c"][a]
                           for a in range(len(meta["dens_c"]))]
            if any(c % 8 for c in cs_gate):
                ptabs = None
        if self.patch_cfg is not None and ptabs is not None:
            # THE FUSED VARIANT MUST SHARE THE CHUNK TILE: the pack's
            # S-major lane order is baked at `tile` (tbo below), and
            # the kernel decodes lanes via tile_r = blk // S — reading
            # pack blocks at any OTHER width silently mis-decodes
            # (s, r) and composites the wrong lanes. That, not Mosaic,
            # was the round-4/5 multi-axis fused-patch "miscompile":
            # forcing a mismatched tile on CPU interpret reproduces
            # parity 0.27 exactly (round-5 repro). So the fused
            # variant's VMEM demand is folded into the CHUNK tile
            # choice here, never into a variant-local tile.
            ppx_, ppy_ = self.patch_cfg[:2]
            P_t = ppx_ * ppy_
            # the estimate applies only when the fused variant will
            # actually run: dyn1 rides HYPERREEL_FUSED_PATCH (default
            # on); multi-axis is opt-in via HYPERREEL_FUSED_PATCH_MULTI
            # (default two-kernel — wrongly blamed on Mosaic until the
            # lane-decode bug above was found; HW re-verification
            # pending)
            will_fuse = fuse_env if dyn1 else (
                os.environ.get("HYPERREEL_FUSED_PATCH_MULTI") == "1")
            fp_lane = 0
            if will_fuse:
                # per-(blk lane) bytes inside _shade_kernel_fused_patch
                # (dyn1) / _shade_kernel_multi_fused_patch: bf16 patch
                # block (double-buffered) + ONE f32 patch transpose +
                # R f32 pack blocks + two two-hot strips + zfeat +
                # feats + out accumulators. Calibrated vs the measured
                # viewer OOM ((4,3) C=16 blk=4096 -> 16.34 MB demand;
                # this estimate x1.25 gives 16.8) and the compiled
                # bench point ((3,2) -> est 14.9 <= cap, real <= 16).
                if dyn1:
                    cs_ = [meta["C"]]
                    tt_rows = meta["C"] if uniform_t \
                        else (meta["TH"] + 2) * meta["C"]
                else:
                    cs_ = [meta["dens_c"][a] + meta["app_c"][a]
                           for a in range(len(meta["dens_c"]))]
                    tt_rows = max(
                        ((th + 2) * c if th and not uniform_t else c)
                        for th, c in zip(meta["time_hs"], cs_))
                # the fused kernels keep the patch transpose in bf16
                # (lossless — the gathered rows ARE bf16) and cast
                # texel slices to f32 at use, so the transpose term is
                # x2 not x4
                fp_lane = (sum(P_t * c * 2 for c in cs_) * 2
                           + max(P_t * c * 2 for c in cs_)
                           + Rb * 16 * 4 + 1024 + tt_rows * 4
                           + 2 * max(cs_) * 4 + 3 * n_basis * 8
                           + 8 * Rb * 4)
                if not dyn1:
                    # the multi fused kernel keeps R per-phase density
                    # + app-basis accumulators live across the axis
                    # loop (dyn1 shades each phase immediately)
                    fp_lane += Rb * (3 * n_basis + 1) * 4
                fp_lane = int(fp_lane * 1.25)
            pt = tile
            while pt > 4 and (
                    B % (Rb * pt) != 0
                    or pt * S_shade * fp_lane > 31 * (1 << 19)):
                pt //= 2
            if pt > 4 and B % (Rb * pt) == 0:
                tile = pt
                patch = self.patch_cfg[:2]
        if os.environ.get("HYPERREEL_ROUTE_DEBUG"):
            import sys as _sys
            print(f"# route: dyn1={dyn1} tile={tile} patch={patch} "
                  f"Rb={Rb} pm_rays={pm_rays} "
                  f"pack_ok={self._pack_ok and tile == 128}",
                  file=_sys.stderr, flush=True)
        if patch and not pm_rays:
            D_in = rays.shape[1]
            rays = rays.reshape(B // Rb, Rb, D_in).transpose(
                1, 0, 2).reshape(B, D_in)

        # the pack-build kernel's [S, T] -> [1, S*T] reshape only lowers
        # at 128 lanes (exp_pallas_probe6.py)
        use_pk = self._pack_ok and tile == 128
        stride_pk = None
        if use_pk and self.stride_k:
            st = S // self.stride_k if S % self.stride_k == 0 else 0
            if self.compact_k or st < 4 or (st & (st - 1)):
                # compact+stride combos and non-power-of-two strides
                # keep the legacy CF-XLA tail; stride 2 (k = S/2) is
                # HW-measured SLOWER in-kernel than the legacy tail
                # (7.98 vs 11.21 Mrays/s at k=16 —
                # experiments/verify_stride_kernel_hw.py), while
                # stride 4 (k=8) is faster (22.57 vs 15.79).
                # Provenance: both numbers are flagship-only
                # (technicolor_z_plane); multi-axis stride-2 is
                # unmeasured, so the cutoff may be conservative there
                # (both routes stay parity-gated either way)
                use_pk = False
            else:
                stride_pk = st

        # ---- per-ray inputs: existing param/PE code on the tiny [B, c]
        # blocks, then rows via one-hot reduces
        pred = self.pred
        feats = []
        for (start, end), rp, pe in zip(pred.param_ranges, pred.params_fns,
                                        pred.pes):
            feats.append(pe.apply(rp.apply(rays[:, start:end]), ctx))
        net_in = jnp.concatenate(feats, -1)          # [B, in_ch], tiny C
        net_in_cf = jnp.stack(_rows_of(net_in, net_in.shape[1]))

        # bf16 pack-kernel input (HYPERREEL_BF16_PACK_INPUT=1): halves
        # the [P*S, B] HBM write+read at the MLP/kernel boundary but is
        # NOT lossless on TPU — XLA fuses the old astype(f32) into the
        # bf16 matmul as an f32-ACCUMULATED output, so f32 storage
        # carries full accumulator precision that bf16 storage rounds
        # away (the bf16_tail sim could not see this: bf16->bf16 casts
        # are dtype no-ops). Default OFF pending the HW A/B.
        bf16_in = use_pk and os.environ.get(
            "HYPERREEL_BF16_PACK_INPUT") == "1"
        # MLP INSIDE the pack kernel (round 5, HYPERREEL_PK_MLP): the
        # XLA MLP materializes every [256, B] inter-layer activation in
        # HBM (~2.1 GB/chunk) plus the f32 [P*S, B] boundary the pack
        # kernel re-reads (~2.4 ms/chunk total, fused_glue_r8c).
        # In-kernel, activations stay VMEM-resident per ray tile and
        # only the tiny net input crosses HBM. Requires a bf16-compute
        # BaseMLP with a Mosaic-safe layer activation.
        pk_mlp = None
        if use_pk and os.environ.get(
                "HYPERREEL_PK_MLP", "1") != "0":
            from hyperreel_tpu.ops.pallas.pack_build import (
                act_cfg_supported)
            if (net_mlp := self.pred.net).compute_dtype == jnp.bfloat16 \
                    and act_cfg_supported(net_mlp.layer_activation):
                pk_mlp = self._mlp_kernel_spec(
                    eparams["ray_prediction_0"]["net"], net_in_cf)
        out_cf = None
        if pk_mlp is None:
            out_cf = self._mlp_cf(eparams["ray_prediction_0"]["net"],
                                  net_in_cf, ctx, field_major=use_pk,
                                  keep_dtype=bf16_in)    # [S*preds, B]
            if out_cf.dtype != jnp.float32 and (
                    out_cf.dtype != jnp.bfloat16 or out_cf.shape[0] % 16):
                # bf16 VMEM blocks tile at 16 sublanes; odd row counts
                # (and any non-bf16 compute dtype) take the f32 path
                out_cf = out_cf.astype(jnp.float32)

        def field_rows(name):
            off, width = self.field_offsets[name]
            act = pred.activations[pred.output_names.index(name)]
            rows = [act(out_cf[off + c::self.preds], ctx)
                    for c in range(width)]
            return rows                              # list of [S, B]

        # ---- per-ray rows shared by both embedding paths
        from hyperreel_tpu.models.embeddings import get_base_time
        rrows = _rows_of(rays[:, :8] if rays.shape[1] >= 8
                         else rays, min(rays.shape[1], 8))
        o_rows, d_rows = rrows[0:3], rrows[3:6]
        t_row = rrows[7] if len(rrows) > 7 else jnp.zeros_like(o_rows[0])
        if self.flow is not None:
            base_t = get_base_time(
                t_row, self.flow.num_keyframes, self.flow.num_frames,
                self.flow.flow_scale, False, ctx.rng)    # [B]
            dt_row = t_row - base_t                      # [B]
            tn_ray = (base_t * net.time_scale_factor
                      + net.time_pixel_offset) * 2.0 - 1.0
        else:
            base_t = jnp.zeros_like(t_row)
            dt_row = jnp.zeros_like(t_row)
            tn_ray = jnp.zeros_like(t_row)
        isect = self.isect
        samples = np.broadcast_to(
            np.asarray(isect.samples, np.float32).reshape(-1),
            (S,))[:, None]                           # [S, 1]
        z_scale = np.broadcast_to(
            np.asarray(isect.z_scale, np.float32).reshape(-1),
            (S,))[:, None] if np.asarray(isect.z_scale).size > 1 \
            else np.asarray(isect.z_scale, np.float32).reshape(1, 1)

        if use_pk:
            # ---- ONE Pallas kernel for the whole embedding tail
            # (ops/pallas/pack_build.py): per-field activations, z
            # processing, ray distances, the bitonic z-sort, first-k
            # compaction, advection, point offsets, aabb normalization,
            # and the pack + gather-index build — emitted directly in
            # the shade kernel's S-major block order
            from hyperreel_tpu.ops.pallas.pack_build import pack_build
            from hyperreel_tpu.models.intersect import _FAR_SENTINEL
            field_acts = {
                name: pred.activations[pred.output_names.index(name)]
                for name in self.field_offsets}
            ray_pack = jnp.stack(
                [o_rows[0], o_rows[1], o_rows[2],
                 d_rows[0], d_rows[1], d_rows[2], dt_row, tn_ray], 0)
            Sr = self.compact_k or self.stride_k or S
            pack, idx8 = pack_build(
                out_cf, ray_pack, ctx.it, S=S, k=Sr, tile=tile,
                samples=samples[:, 0], z_scale=z_scale.reshape(-1),
                field_offsets=self.field_offsets, field_acts=field_acts,
                isect_act=isect.activation,
                flow_act=self.flow.spatial_flow_activation
                if self.flow is not None else None,
                po_act=self.po.activation,
                has_sigma="sigma" in self.field_offsets,
                has_flow=self.flow is not None,
                po_use_sigma=self.po.use_sigma
                and self.po.in_density_field in self.field_offsets,
                po_sigma_field=self.po.in_density_field,
                far_sentinel=_FAR_SENTINEL
                if isect.invalid_sort_far else None,
                aabb=np.asarray(net.aabb, np.float32),
                axis_specs=axis_specs,
                contract_rows=isect.contract.contract_rows
                if isect.contract.name != "identity" else None,
                inv_cdist=isect.contract.inverse_contract_distance
                if isect.contract.contract_samples else None,
                stride=stride_pk,
                emit_idx=not patch, mlp=pk_mlp)
            rows_list = None if patch else [
                tabs[a][0][idx8[a]] for a in range(len(axis_specs))]
            S = Sr
        else:
            # ---- legacy channels-first XLA embedding tail
            z = field_rows("z_vals")[0]
            sigma = field_rows("sigma")[0] \
                if "sigma" in self.field_offsets else jnp.zeros((S, B))
            if self.po.use_sigma and \
                    self.po.in_density_field in self.field_offsets:
                point_sigma = field_rows(self.po.in_density_field)[0]
            else:
                point_sigma = jnp.zeros((S, B))
            flow_rows = field_rows("spatial_flow") \
                if self.flow is not None else None
            poff_rows = field_rows("point_offset")
            zero_rows = [jnp.zeros((S, B), jnp.float32)] * 3
            cs_rows = field_rows("color_scale") \
                if "color_scale" in self.field_offsets else list(zero_rows)
            csh_rows = field_rows("color_shift") \
                if "color_shift" in self.field_offsets \
                else list(zero_rows)

            # ---- intersect (z_plane rows; reference
            # nlf/intersect/z.py:77-97 + base.py:142-259 driver,
            # values-only sort)
            z = isect.activation(z, ctx) * (1.0 - sigma)
            z = z * jnp.asarray(z_scale) + jnp.asarray(samples)
            if isect.contract.contract_samples:
                # anchors live in contracted sample space
                # (process_z_vals, reference nlf/intersect/base.py:128-140)
                z = isect.contract.inverse_contract_distance(z)

            eps_dir, big = 1e-5, 1e12  # ops/intersect_math.py _safe_dirs
            dz = jnp.where(jnp.abs(d_rows[2]) < eps_dir,
                           jnp.full_like(d_rows[2], big), d_rows[2])
            dists = (z - o_rows[2][None]) / dz[None]     # [S, B]
            if self.isect.invalid_sort_far:
                # sentinel distances ride through: the sample point
                # lands far outside the aabb (kernel validity excludes
                # it) and the boundary valid sample's delta saturates,
                # matching the general path (see intersect.py
                # invalid_sort_far note)
                from hyperreel_tpu.models.intersect import _FAR_SENTINEL
                dists = jnp.where(
                    dists <= 0.0,
                    jnp.full_like(dists, _FAR_SENTINEL), dists)
                dists = _cf_bitonic_sort(dists)
                Sr = self.compact_k or S
                dists = dists[:Sr]                   # first-k compaction
            else:
                dists = jnp.where(dists <= 0.0, jnp.zeros_like(dists),
                                  dists)
                dists = _cf_bitonic_sort(dists)
                Sr = S
            sel = slice(0, Sr)
            if self.stride_k:
                # positional every-(S/k)-th subselection: both the
                # sorted dists and the prediction-ordered field rows are
                # sliced by POSITION, exactly like the general path's
                # select_points after its values-only sort
                sel = slice(None, None, S // self.stride_k)
                dists = dists[sel]
                Sr = self.stride_k
            if Sr != S:
                point_sigma = point_sigma[sel]
                if flow_rows is not None:
                    flow_rows = [r[sel] for r in flow_rows]
                poff_rows = [r[sel] for r in poff_rows]
                cs_rows = [r[sel] for r in cs_rows]
                csh_rows = [r[sel] for r in csh_rows]
            S = Sr

            # ---- advect (reference embedding/point.py:741-834, eval:
            # no jitter) — flow/point fields stay in prediction-index
            # order, matching the general path's values-only sort.
            # Static chains have no flow stage and no time.
            dt = dt_row[None] if self.flow is not None else None

            p_rows = [o_rows[c][None] + d_rows[c][None] * dists
                      for c in range(3)]
            if self.isect.contract.name != "identity":
                # scene contraction between intersect and advection
                # (reference nlf/intersect/base.py:242-246): contract
                # points AND re-derive distances in contracted space;
                # rows stack on the LEADING component axis (full-lane
                # norms)
                mask0 = dists <= 0.0
                p_stack = jnp.stack(p_rows, 0)               # [3, S, B]
                o_stack = jnp.stack([r[None] for r in o_rows], 0)
                cpf = self.isect.contract.contract_points_cf
                p_c = cpf(p_stack)
                o_c = cpf(o_stack)
                d_c = jnp.sqrt(jnp.maximum(
                    jnp.sum((p_c - o_c) ** 2, 0), 1e-24))
                dists = jnp.where(mask0, jnp.zeros_like(dists), d_c)
                p_rows = [p_c[c] for c in range(3)]
            for c in range(3):
                p = p_rows[c]
                if self.flow is not None:
                    p = p + self.flow.spatial_flow_activation(
                        flow_rows[c], ctx) * dt
                off = self.po.activation(poff_rows[c], ctx) \
                    * (1.0 - point_sigma)
                p_rows[c] = p + off

            # ---- normalize to grid coords (tensorf.py normalize_coord
            # / normalize_time_coord)
            aabb = np.asarray(net.aabb, np.float32)
            inv = 2.0 / (aabb[1] - aabb[0])
            xn = (p_rows[0] - aabb[0][0]) * inv[0] - 1.0
            yn = (p_rows[1] - aabb[0][1]) * inv[1] - 1.0
            zn = (p_rows[2] - aabb[0][2]) * inv[2] - 1.0
            if self.flow is not None:
                tn = jnp.broadcast_to(tn_ray[None], (S, B))
            else:
                tn = jnp.zeros((S, B), jnp.float32)
            comp_rows = (xn, yn, zn)

            # kernel lane order: S-major blocks (lane = s*tile + r) —
            # the [S, nb, tile] -> [nb, S, tile] reorder keeps the
            # 128-lane minor dim intact (a plain tiled copy); a
            # ray-major [S, B] -> [B, S] transpose instead lowers to a
            # ~15 ms while-loop (the small-minor-dim transpose class,
            # PERFORMANCE.md)
            def gather_idx(px, py, Ww, Hh, tbo):
                xi = (jnp.clip(jnp.floor(px), -1, Ww - 1) + 1).astype(
                    jnp.int32)
                yi = (jnp.clip(jnp.floor(py), -1, Hh - 1) + 1).astype(
                    jnp.int32)
                return tbo(yi * (Ww + 1) + xi)

            nb = B // tile

            def tbo(a):
                """[..., S, B] -> [..., N] in kernel block order."""
                lead = a.shape[:-2]
                a = a.reshape(lead + (S, nb, tile))
                perm = tuple(range(len(lead))) + (
                    len(lead) + 1, len(lead), len(lead) + 2)
                return a.transpose(perm).reshape(lead + (S * B,))

            rows_list = []
            if not patch:
                for (table, W, H), (_, _, m0, m1) in zip(tabs, axis_specs):
                    px = (comp_rows[m0] + 1.0) * 0.5 * (W - 1)
                    py = (comp_rows[m1] + 1.0) * 0.5 * (H - 1)
                    rows_list.append(table[gather_idx(px, py, W, H, tbo)])

            # ONE batched CF -> kernel-block-order relayout
            vd_rows_cf = [jnp.broadcast_to(d_rows[c][None], (S, B))
                          for c in range(3)]
            rows16 = [xn, yn, zn, tn, dists,
                      cs_rows[0], cs_rows[1], cs_rows[2],
                      csh_rows[0], csh_rows[1], csh_rows[2],
                      *vd_rows_cf,
                      jnp.zeros((S, B), jnp.float32),
                      jnp.zeros((S, B), jnp.float32)]
            pack = tbo(jnp.stack(rows16, 0))         # [16, N]

        if patch:
            # ---- coherent patch-gather: ONE (px x py)-texel row per
            # 4-consecutive-ray block (same sorted slot; lanes are
            # s-major so 4 consecutive lanes = 4 consecutive rays),
            # blended to channels-first features by the patch-blend
            # kernel, then the shade kernel skips its corner blend
            # (preblended=True). Exact when block footprints fit the
            # patch; out-of-patch corners degrade to the zero-padding
            # value (ops/patch_gather.py).
            from hyperreel_tpu.ops.pallas.patch_blend import (
                patch_blend, patch_anchor_idx)
            ppx, ppy = patch

            # patch-EXACTNESS diagnostic (round-5, VERDICT item 7):
            # per-(block, slot) the patch path zero-degrades exactly
            # when the block's VALID samples' bilinear footprint exits
            # the (px, py) patch on some plane axis: floor(max) -
            # floor(min) > p - 2. Invalid samples (OOB comp / dist<=0)
            # are sigma-masked in the kernel, so they are excluded via
            # +/-inf sentinels (an all-invalid block can't violate).
            # Scalar mean over the OR of all axis-dims, returned as
            # outputs["patch_coverage_viol"] — callers (bench probe,
            # tests, serving gates) enforce the exactness contract on
            # it instead of trusting a shape default. HW ground truth:
            # (3,2)/(3,3)/(4,3) are 7e-5-exact at bench density while
            # (2,2) is 2.9e-3-INEXACT (verify_pm3.log).
            ok_row = ((jnp.abs(pack[0]) <= 1.0)
                      & (jnp.abs(pack[1]) <= 1.0)
                      & (jnp.abs(pack[2]) <= 1.0) & (pack[4] > 0.0))

            def _rN(r, op):
                qq = r.shape[0] // Rb
                acc = None
                for p in range(Rb):
                    s = r[p * qq:(p + 1) * qq]
                    acc = s if acc is None else op(acc, s)
                return acc

            viol_blocks = None
            for (Wa, Ha, m0a, m1a) in axis_specs:
                for mm, size, budget in ((m0a, Wa, ppx), (m1a, Ha, ppy)):
                    t = (pack[mm] + 1.0) * 0.5 * (size - 1)
                    f = jnp.floor(t)
                    lo = _rN(jnp.where(ok_row, f, jnp.float32(3e38)),
                             jnp.minimum)
                    hi = _rN(jnp.where(ok_row, f, jnp.float32(-3e38)),
                             jnp.maximum)
                    va = hi - lo > budget - 2
                    viol_blocks = va if viol_blocks is None \
                        else (viol_blocks | va)
            patch_viol = jnp.mean(viol_blocks.astype(jnp.float32))

            def patch_feats(a, C_a):
                W, H, m0, m1 = axis_specs[a]
                # anchors: elementwise min over the 4 contiguous phase
                # quarters of the normalized pack rows (scale commutes
                # with the min); per-sample (u, v) offsets are computed
                # INSIDE the blend kernel from quarter-offset pack
                # blocks — the former XLA-side uv build (two full-[N]
                # scale passes + a while-loop reshape + the [8, J]
                # concat's update-slices, ~2.3 ms/chunk) has no HBM
                # footprint at all now (round-4 HLO attribution)
                pidx, anchors = patch_anchor_idx(pack[m0], pack[m1],
                                                 W, H, R=Rb)
                J = pidx.shape[0]
                blkj = 1024
                while J % blkj:
                    blkj //= 2
                # raw phase-major [R*C_a, J] output: the shade kernel
                # consumes it directly via a BlockSpec index map
                # (preblended="phase_major") — no relayout copy
                return patch_blend(
                    ptabs[a][pidx], anchors, pack, m0=m0, m1=m1,
                    W=W, H=H, px=ppx, py=ppy, C=C_a,
                    blkj=blkj, out_dtype=jnp.bfloat16, R=Rb)

            fuse_patch = fuse_env
            if not dyn1:
                # Multi-axis fused-patch is OPT-IN
                # (HYPERREEL_FUSED_PATCH_MULTI=1). HISTORY: rounds 4-5
                # blamed its wrong HW output (llff 9.4e-2) on a Mosaic
                # miscompile; the actual bug was a variant-local tile
                # (tile_fp) differing from the CHUNK tile the pack's
                # S-major lane order was baked at — the kernel decodes
                # lanes via tile_r = blk // S, so mismatched widths
                # silently composite the wrong lanes. A CPU-interpret
                # repro with a forced mismatched tile reproduces
                # parity 0.27; matched tiles are exact. The fused call
                # now ALWAYS shares the chunk tile (whose choice
                # accounts for the fused VMEM demand, fp_lane above).
                # Default stays the HW-proven two-kernel route until
                # the matched-tile fused variant re-verifies on HW at
                # >= its throughput (llff 5.86 / n3d 3.32 Mrays/s).
                fuse_patch = os.environ.get(
                    "HYPERREEL_FUSED_PATCH_MULTI") == "1"
            if fuse_patch:
                # blend+shade FUSION (shade.py _shade_kernel_fused_patch
                # / _shade_kernel_multi_fused_patch): hand the gathered
                # patch rows + anchors straight to the shade kernel —
                # the per-axis [4C, J] f32 feature arrays never exist in
                # HBM and the blend kernel's duplicate pack reads vanish
                # (~3 ms/chunk of I/O at flagship channel counts).
                # HYPERREEL_FUSED_PATCH=0 restores the separate
                # patch-blend kernel (A/B knob).
                rows_list, anchors_list = [], []
                for a in range(1 if dyn1 else len(axis_specs)):
                    Wa, Ha, m0a, m1a = axis_specs[a]
                    pidx, anc = patch_anchor_idx(
                        pack[m0a], pack[m1a], Wa, Ha, R=Rb)
                    rows_list.append(ptabs[a][pidx])
                    anchors_list.append(anc)
                p_anchors = anchors_list[0]
            elif dyn1:
                rows_list = [patch_feats(0, C)]
            else:
                rows_list = [patch_feats(a, dens_c[a] + app_c[a])
                             for a in range(len(axis_specs))]
        else:
            fuse_patch = False

        # ---- UNIFORM-TIME PREMIX (round 5): a frame render shares ONE
        # t across every ray, so the keyframe time mix can be hoisted
        # OUT of the shade kernel: mix the [(TH+2)*C, Rt] time table
        # down to [C, Rt] with the frame's scalar t weights (two
        # dynamic row-group picks — bit-identical corner math to
        # _shade_core) and run the kernel with TH=0. The kernel's
        # dominant cost is the z-two-hot MXU matmul whose FLOPs scale
        # with the fetched row count, so this is a (TH+2)x cut of the
        # flagship shade kernel (~5.8 ms/chunk, ~90% that matmul —
        # round-5 fused_glue trace) and (TH_a+2)x per dynamic axis of
        # the multi families. Caller contract: every ray in the chunk
        # carries the same t; the in-graph witness
        # outputs["uniform_time_viol"] = max|tn - tn[0]| is returned
        # for callers to enforce (same pattern as the patch coverage
        # witness) — it is exactly 0 on frame renders.
        # (uniform_t hoisted above the tile choice — VMEM budgets)
        ut_viol = None
        if uniform_t:
            ut_viol = jnp.max(jnp.abs(tn_ray - tn_ray[0]))

            def _premix(tt, THa, C_a):
                tn0 = tn_ray[0]
                pt = (tn0 + 1.0) * 0.5 * (THa - 1)
                p0 = jnp.floor(pt)
                ft = pt - p0
                tb = (jnp.clip(p0, -1.0, THa - 1.0) + 1.0).astype(
                    jnp.int32)
                t_lo = ((p0 >= 0.0) & (p0 <= THa - 1.0)).astype(
                    jnp.float32)
                t_hi = ((p0 + 1.0 >= 0.0)
                        & (p0 + 1.0 <= THa - 1.0)).astype(jnp.float32)
                karr = jnp.arange(THa + 2, dtype=jnp.int32)
                mk = (jnp.where(karr == tb, (1.0 - ft) * t_lo, 0.0)
                      + jnp.where(karr == tb + 1, ft * t_hi, 0.0))
                return jnp.tensordot(
                    mk, tt.reshape(THa + 2, C_a, tt.shape[-1]), axes=1)

            if dyn1:
                if TH > 0:
                    ttab_t = _premix(ttab_t, TH, C)
                    TH = 0
            else:
                line_tabs = [
                    _premix(tt, time_hs[a], dens_c[a] + app_c[a])
                    if time_hs[a] else tt
                    for a, tt in enumerate(line_tabs)]
                time_hs = [0] * len(time_hs)

        if dyn1:
            if patch and fuse_patch:
                out = fused_shade_composite(
                    rows_list[0], pack, ttab_t, wb_t,
                    S=S, W=tabs[0][1], H=tabs[0][2], TW=TW, TH=TH,
                    n_density=nd, n_basis=n_basis, shading=shading,
                    density_shift=0.0,
                    distance_scale=net.distance_scale,
                    tile=tile, s_major=True, preblended="fused_patch",
                    anchors=p_anchors, patch_pxy=patch,
                    m0=axis_specs[0][2], m1=axis_specs[0][3],
                    patch_block=Rb)
            else:
                out = fused_shade_composite(
                    rows_list[0], pack, ttab_t, wb_t,
                    S=S, W=tabs[0][1], H=tabs[0][2], TW=TW, TH=TH,
                    n_density=nd, n_basis=n_basis, shading=shading,
                    density_shift=0.0,
                    distance_scale=net.distance_scale,
                    tile=tile, s_major=True,
                    preblended="phase_major" if patch else False,
                    patch_block=Rb)
        else:
            from hyperreel_tpu.ops.pallas.shade import (
                fused_shade_composite_multi)
            if patch and fuse_patch:
                out = fused_shade_composite_multi(
                    rows_list, pack, line_tabs, wb_t,
                    axes=net.active_density, S=S, grid_dims=grid_dims,
                    line_lens=line_lens, time_hs=time_hs,
                    dens_c=dens_c, app_c=app_c, n_basis=n_basis,
                    shading=shading, density_shift=0.0,
                    distance_scale=net.distance_scale,
                    tile=tile, s_major=True,
                    preblended="fused_patch",
                    anchors_list=anchors_list, patch_pxy=patch,
                    patch_block=Rb)
            else:
                out = fused_shade_composite_multi(
                    rows_list, pack, line_tabs, wb_t,
                    axes=net.active_density, S=S, grid_dims=grid_dims,
                    line_lens=line_lens, time_hs=time_hs,
                    dens_c=dens_c, app_c=app_c, n_basis=n_basis,
                    shading=shading, density_shift=0.0,
                    distance_scale=net.distance_scale,
                    tile=tile, s_major=True,
                    preblended="phase_major" if patch else False,
                    patch_block=Rb)

        if patch and not pm_rays:
            # un-permute back to original ray order (the entry
            # permutation put original ray Rb*j+p at position
            # p*B/Rb + j): ONE op on the [B, 5] transposed outputs — a
            # leading-axis sublane copy, not a minor-dim lane
            # interleave; fusing rgb/acc/dist into one avoids 3x the
            # while-loop overhead
            outT = out[:5].T
            outT = outT.reshape(Rb, B // Rb, 5).transpose(
                1, 0, 2).reshape(B, 5)
            rgb_map = outT[:, :3]
            acc_map = outT[:, 3]
            dist_map = outT[:, 4]
        else:
            rgb_map = out[:3].T
            acc_map = out[3]
            dist_map = out[4] if out.shape[0] > 4 else None
        if not net.black_bg and net.white_bg:
            rgb_map = rgb_map + (1.0 - acc_map[:, None])
        rgb_map = jnp.clip(rgb_map, 0.0, 1.0)
        outputs = {"rgb": rgb_map}
        if patch:
            outputs["patch_coverage_viol"] = patch_viol
        if ut_viol is not None:
            outputs["uniform_time_viol"] = ut_viol
        if "distances" in render_kwargs.get("fields", []):
            outputs["distances"] = dist_map[:, None]
        return outputs
