"""Factored feature-grid color nets (reference: nlf/nets/tensorf_base.py,
tensorf_no_sample.py, tensorf_dynamic.py).

TPU-first redesign:
  * grids are channel-last pytree leaves ([H, W, C] planes, [L, C] lines) so
    bilinear gathers are lane-contiguous;
  * no boolean compaction — densities/colors are computed for every sample
    and multiplied by validity masks (static shapes for XLA);
  * the alpha-composite uses a log-space associative scan (ops/render_math);
  * grid upsample / shrink / alpha-mask are host-side param rebuilds between
    training segments (reference TensorBase.set_iter semantics,
    tensorf_base.py:509-553).

Shipped-config coverage (SURVEY.md §2.10): `tensor_vm_split_no_sample` and
`tensor_vm_split_time` are the entire shipped surface; both are here.
"""

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.ops.pallas.shade import kmajor_perm as _kmajor_perm

from hyperreel_tpu.ops.grid_sample import (
    grid_sample_2d,
    grid_sample_1d,
    grid_sample_2d_cf,
    grid_sample_1d_cf,
    grid_sample_2d_cf_packed,
    grid_sample_1d_cf_packed,
    grid_sample_2d_cf_quad,
    grid_sample_1d_cf_quad,
    grid_sample_2d_cf_quad_int8,
    grid_sample_1d_cf_quad_int8,
    grid_sample_3d,
    resize_bilinear_2d,
    resize_linear_1d,
)
from hyperreel_tpu.ops.render_math import (
    raw2alpha,
    alpha2weights,
    scale_shift_color_all,
    scale_shift_color_one,
    transform_color_all,
    transform_color_one,
)
from hyperreel_tpu.ops.sh import sh_render, eval_sh_bases
from hyperreel_tpu.models.mlp import _linear_init, _linear_apply
from hyperreel_tpu.models.pe import basic_pe


def n_to_reso(n_voxels, aabb):
    """Cube-root voxel count -> per-axis resolution
    (reference utils/tensorf_utils.py:65-69). Computed in float32 to
    match the reference's torch-f32 arithmetic: on exact cubes
    (e.g. 24^3 voxels in a [-2, 2]^3 box) f32 rounds the voxel size
    DOWN so the division lands on 24, where f64 truncates to 23."""
    aabb = np.asarray(aabb, np.float32)
    ext = aabb[1] - aabb[0]
    voxel_size = np.power(ext.prod() / np.float32(n_voxels),
                          np.float32(1.0 / 3.0), dtype=np.float32)
    return [int(x) for x in (ext / voxel_size)]


def upsample_schedule(n_init, n_final, n_steps):
    """Log-spaced voxel-count schedule
    (reference nlf/nets/tensorf_base.py:171-198)."""
    return [
        int(round(float(x)))
        for x in np.exp(np.linspace(np.log(n_init), np.log(n_final), n_steps + 1))
    ][1:]


# ---------------------------------------------------------------------------
# Shading heads (reference utils/tensorf_utils.py:334-456,
# nlf/nets/tensorf_base.py:38-135)
# ---------------------------------------------------------------------------

def _shading_sh(deg=2):
    def render(params, pts, viewdirs, features, kw):
        return sh_render(viewdirs, features, deg=deg)

    return render, {}


def _shading_rgb():
    def render(params, pts, viewdirs, features, kw):
        return jax.nn.sigmoid(features)

    return render, {}


def _shading_rgb_identity():
    def render(params, pts, viewdirs, features, kw):
        return jnp.abs(features + 0.5)

    return render, {}


def _shading_rgbt_linear():
    def render(params, pts, viewdirs, features, kw):
        coeffs = features.reshape(features.shape[:-1] + (3, 2))
        t = kw["times"][..., :1]
        basis = jnp.concatenate([jnp.ones_like(t), t], -1)
        return jnp.maximum(jnp.sum(basis[..., None, :] * coeffs, -1) + 0.5, 0.0)

    return render, {}


def _time_fourier_basis(kw):
    fpk = kw["frames_per_keyframe"]
    K = kw["num_keyframes"]
    F = kw["total_num_frames"]
    scale = K * (F - 1) / F
    time_offset = kw["time_offset"][..., :1] * scale
    t = kw["times"][..., :1]
    freqs = jnp.arange(fpk, dtype=jnp.float32)
    ang = time_offset * freqs * 2.0 * np.pi
    return jnp.concatenate([t, jnp.cos(ang), jnp.sin(ang)], -1)


def _shading_rgbt_fourier():
    def render(params, pts, viewdirs, features, kw):
        fpk = kw["frames_per_keyframe"]
        coeffs = features.reshape(features.shape[:-1] + (3, fpk * 2 + 1))
        basis = _time_fourier_basis(kw)
        return jnp.maximum(jnp.sum(basis[..., None, :] * coeffs, -1) + 0.5, 0.0)

    return render, {}


def _mlp_render_init(key, app_dim, viewpe, feape, hidden):
    in_c = 2 * viewpe * 3 + 2 * feape * app_dim + 3 + app_dim
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "l0": _linear_init(k1, in_c, hidden),
        "l1": _linear_init(k2, hidden, hidden),
        "l2": {**_linear_init(k3, hidden, 3), "b": jnp.zeros((3,), jnp.float32)},
    }


def _positional_encoding(x, n):
    freqs = 2.0 ** jnp.arange(n, dtype=jnp.float32)
    ang = (x[..., None] * freqs).reshape(x.shape[:-1] + (-1,))
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)


def _shading_mlp_fea(app_dim, viewpe=6, feape=6, hidden=128):
    """MLPRender_Fea (reference nlf/nets/tensorf_base.py:38-69)."""

    def render(params, pts, viewdirs, features, kw):
        parts = [features, viewdirs]
        if feape > 0:
            parts.append(_positional_encoding(features, feape))
        if viewpe > 0:
            parts.append(_positional_encoding(viewdirs, viewpe))
        h = jnp.concatenate(parts, -1)
        h = jnp.maximum(_linear_apply(params["l0"], h), 0.0)
        h = jnp.maximum(_linear_apply(params["l1"], h), 0.0)
        return jax.nn.sigmoid(_linear_apply(params["l2"], h))

    def init(key):
        return _mlp_render_init(key, app_dim, viewpe, feape, hidden)

    return render, init


# density decode heads (reference utils/tensorf_utils.py:430-456)

def _density_plain(features, kw):
    return features[..., 0]


def _density_linear(features, kw):
    coeffs = features.reshape(features.shape[:-1] + (1, 2))
    t = kw["times"][..., :1]
    basis = jnp.concatenate([jnp.ones_like(t), t], -1)
    return jnp.sum(basis[..., None, :] * coeffs, -1)[..., 0]


def _density_fourier(features, kw):
    fpk = kw["frames_per_keyframe"]
    coeffs = features.reshape(features.shape[:-1] + (1, fpk * 2 + 1))
    basis = _time_fourier_basis(kw)
    return jnp.sum(basis[..., None, :] * coeffs, -1)[..., 0]


# ---------------------------------------------------------------------------
# Static net: TensorVMSplit (no-sample variant)
# ---------------------------------------------------------------------------

MAT_MODE = ((0, 1), (0, 2), (1, 2))
VEC_MODE = (2, 1, 0)


@dataclass
class TensorVMNoSample:
    """Static HyperReel color net (reference nlf/nets/tensorf_no_sample.py).

    Consumes externally predicted points/distances/viewdirs/weights and
    over-composites densities from a VM-factorized grid.
    """

    cfg: dict
    grid_size: Optional[List[int]] = None  # current resolution (host state)
    aabb: Optional[np.ndarray] = None

    def __post_init__(self):
        cfg = self.cfg
        # bf16 gather tables: the corner gathers are the measured render
        # bottleneck (~9G gathered elements/s on v5e); halving gathered
        # bytes roughly halves that cost. Params stay f32 for the optimizer.
        # table_dtype: "bf16" (default), "f32", or "int8" (eval-only
        # quantized gathers — halves the gathered words; ~0.4% feature
        # error). bf16_tables=false maps to f32 for compatibility.
        self.table_kind = str(cfg.get("table_dtype", "")).lower()
        if self.table_kind not in ("int8", "f32", "bf16"):
            self.table_kind = "bf16" if cfg.get("bf16_tables", True) \
                else "f32"
        self.table_dtype = jnp.bfloat16 if cfg.get("bf16_tables", True) \
            else jnp.float32
        self.white_bg = int(cfg.get("white_bg", 0))
        self.black_bg = int(cfg.get("black_bg", 0))
        self.fea2dense = cfg.get("fea2denseAct", "softplus")
        self.density_shift = float(cfg.get("density_shift", -10.0))
        self.distance_scale = float(cfg.get("distance_scale", 25.0))
        self.ray_march_weight_thres = float(cfg.get("rm_weight_mask_thre", 1e-4))
        self.alpha_mask_thres = float(cfg.get("alpha_mask_thre", 1e-3))
        if self.aabb is None:
            self.aabb = np.asarray(cfg["aabb"], np.float32)
        self.density_n_comp = list(cfg.get("n_lamb_sigma", [8, 8, 8]))
        self.app_n_comp = list(cfg.get("n_lamb_sh", [24, 24, 24]))
        self.app_dim = int(cfg.get("data_dim_color", 27))
        self.shading_mode = cfg.get("shadingMode", "SH")
        if self.grid_size is None:
            self.grid_size = n_to_reso(int(cfg["N_voxel_init"]), self.aabb)
        self.upsamp_list = list(cfg.get("upsamp_list", []))
        self.update_alphamask_list = list(cfg.get("update_AlphaMask_list", []))
        self.n_voxel_list = upsample_schedule(
            int(cfg.get("N_voxel_init", 2097152)),
            int(cfg.get("N_voxel_final", 2097152)),
            len(self.upsamp_list),
        ) if self.upsamp_list else []
        self.lr_upsample_reset = bool(cfg.get("lr_upsample_reset", True))

        fcfg = cfg.get("filter", None)
        self.apply_filter_weights = fcfg is not None
        self.filter_weight_thresh = float(fcfg.get("weight_thresh", 1e-3)) if fcfg else 1e-3
        self.filter_max_samples = int(fcfg.get("max_samples", 32)) if fcfg else 32
        self.filter_wait_iters = float(fcfg.get("wait_iters", 12000)) if fcfg else 12000.0

        self.active_density = [i for i in range(3) if self.density_n_comp[i] > 0]
        self.active_app = [i for i in range(3) if self.app_n_comp[i] > 0]

        # fused Pallas eval (ops/pallas/shade.py): the single-axis static
        # net maps onto the dynamic kernel with a DEGENERATE time plane —
        # the z line factor becomes a TH=1 "time" table whose t-bilinear
        # always selects the one real row (tn arbitrary), and the
        # predicted per-sample weights ride pack row 14
        self.fused_render = bool(cfg.get("fused_render", False))
        self._fused_eligible = (
            self.shading_mode in ("SH", "RGB")
            and len(self.active_density) >= 1
            and self.active_density == self.active_app
            and self.table_kind == "bf16"
            and not self.apply_filter_weights
            and self.ray_march_weight_thres == 0.0
            and self.fea2dense == "relu")

        if self.shading_mode == "SH":
            deg = int(round(math.sqrt(self.app_dim / 3))) - 1
            self._sh_deg = deg
            self.render_fn, _ = _shading_sh(deg)
            self.render_init = None
        elif self.shading_mode == "RGB":
            self.render_fn, _ = _shading_rgb()
            self.render_init = None
        elif self.shading_mode == "RGBIdentity":
            self.render_fn, _ = _shading_rgb_identity()
            self.render_init = None
        elif self.shading_mode == "MLP_Fea":
            self.render_fn, self.render_init = _shading_mlp_fea(
                self.app_dim,
                int(cfg.get("view_pe", 6)),
                int(cfg.get("fea_pe", 6)),
                int(cfg.get("featureC", 128)),
            )
        else:
            raise ValueError(f"unsupported shadingMode {self.shading_mode}")

    # -- params ------------------------------------------------------------

    def _init_vm(self, key, n_comp, scale, uniform=False):
        params = {}
        gs = self.grid_size
        for i in range(3):
            if n_comp[i] == 0:
                continue
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            k1, k2, key = jax.random.split(key, 3)
            if uniform:
                plane = jnp.clip(
                    scale * jax.random.uniform(k1, (gs[m1], gs[m0], n_comp[i])),
                    1e-2, 1e8)
                line = jnp.clip(
                    scale * jax.random.uniform(k2, (gs[v], n_comp[i])),
                    1e-2, 1e8)
            else:
                plane = scale * jax.random.normal(k1, (gs[m1], gs[m0], n_comp[i]))
                line = scale * jax.random.normal(k2, (gs[v], n_comp[i]))
            params[f"plane_{i}"] = plane
            params[f"line_{i}"] = line
        return params

    def init(self, key):
        kd, ka, kb, kr = jax.random.split(key, 4)
        # init scales per reference tensorf_base.py:895-991
        if self.fea2dense == "softplus":
            density = self._init_vm(kd, self.density_n_comp, 0.1)
        else:
            density = self._init_vm(kd, self.density_n_comp, 1e-2, uniform=True)
        app = self._init_vm(ka, self.app_n_comp, 0.1)
        params = {
            "density": density,
            "app": app,
            "basis_mat": _linear_init(
                kb, sum(self.app_n_comp), self.app_dim, bias=False),
        }
        if self.render_init is not None:
            params["render"] = self.render_init(kr)
        return params

    def param_groups(self, params):
        """Optimizer-group labels mirroring reference opt_group wiring
        (tensorf_base.py:869-893)."""
        groups = {
            "density": jax.tree.map(lambda _: "color", params["density"]),
            "app": jax.tree.map(lambda _: "color", params["app"]),
        }
        impl = "color_impl" if "MLP" in self.shading_mode else "color"
        groups["basis_mat"] = jax.tree.map(lambda _: impl, params["basis_mat"])
        if "render" in params:
            groups["render"] = jax.tree.map(lambda _: "color_impl",
                                            params["render"])
        return groups

    # -- sampling ----------------------------------------------------------

    def normalize_coord(self, pts):
        aabb = jnp.asarray(self.aabb)
        inv = 2.0 / (aabb[1] - aabb[0])
        return (pts - aabb[0]) * inv - 1.0

    def valid_mask(self, pts):
        aabb = jnp.asarray(self.aabb)
        out = jnp.any((pts < aabb[0]) | (pts > aabb[1]), -1)
        return ~out

    def _sample_density(self, params, xyz):
        """Sigma feature: sum_i plane_i(mat coords) . line_i(vec coord)
        (reference tensorf_no_sample.py:47-80). Channels-first gathers keep
        the batch axis on TPU lanes; the channel reduction happens before
        anything [N, C]-shaped is materialized."""
        shape = xyz.shape[:-1]
        flat = xyz.reshape(-1, 3)
        feat = None
        for i in self.active_density:
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            uv = jnp.stack([flat[:, m0], flat[:, m1]], -1)
            p = grid_sample_2d_cf(params["density"][f"plane_{i}"], uv)
            l = grid_sample_1d_cf(params["density"][f"line_{i}"], flat[:, v])
            s = jnp.sum(p * l, 0)
            feat = s if feat is None else feat + s
        return feat.reshape(shape)

    def _sample_app_cf(self, params, flat_xyz):
        """App features channels-first: [app_dim, N]."""
        feats = []
        for i in self.active_app:
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            uv = jnp.stack([flat_xyz[:, m0], flat_xyz[:, m1]], -1)
            p = grid_sample_2d_cf(params["app"][f"plane_{i}"], uv)
            l = grid_sample_1d_cf(params["app"][f"line_{i}"], flat_xyz[:, v])
            feats.append(p * l)
        feat_cf = jnp.concatenate(feats, 0)  # [C_tot, N]
        w = params["basis_mat"]["w"]         # [C_tot, app_dim]
        return jnp.einsum("cn,cd->dn", feat_cf, w,
                          preferred_element_type=jnp.float32)

    def _sample_app(self, params, xyz):
        shape = xyz.shape[:-1]
        app_cf = self._sample_app_cf(params, xyz.reshape(-1, 3))
        return app_cf.T.reshape(shape + (self.app_dim,))

    def _sample_density_and_app_cf(self, params, flat_xyz):
        """Fused sigma + app sampling with packed gathers: per axis, the
        density and app planes/lines are concatenated channel-wise so each
        bilinear corner fetch serves both fields — half the gather rows of
        sampling them separately (gathers are the TPU bottleneck; measured
        98 ms of a 123 ms forward at 64K rays before packing).

        Returns (sigma_feat [N], app_feat_cf [app_dim, N]).
        """
        cols = _coord_cols(flat_xyz, 3)
        sigma = None
        app_feats = []
        for i in range(3):
            has_d = i in self.active_density
            has_a = i in self.active_app
            if not (has_d or has_a):
                continue
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            uv = jnp.stack([cols[m0], cols[m1]], -1)
            zc = cols[v]
            nd = self.density_n_comp[i] if has_d else 0
            if has_d and has_a:
                plane = jnp.concatenate(
                    [params["density"][f"plane_{i}"],
                     params["app"][f"plane_{i}"]], -1)
                line = jnp.concatenate(
                    [params["density"][f"line_{i}"],
                     params["app"][f"line_{i}"]], -1)
            elif has_d:
                plane = params["density"][f"plane_{i}"]
                line = params["density"][f"line_{i}"]
            else:
                plane = params["app"][f"plane_{i}"]
                line = params["app"][f"line_{i}"]
            C_tot = plane.shape[-1]
            packed_ok = C_tot % 2 == 0 and nd % 2 == 0
            if packed_ok and self.table_kind == "int8" \
                    and C_tot % 4 == 0:
                prod = (grid_sample_2d_cf_quad_int8(plane, uv)
                        * grid_sample_1d_cf_quad_int8(line, zc))
                if has_d:
                    s = jnp.sum(prod[: nd // 2], (0, 2))
                    sigma = s if sigma is None else sigma + s
                if has_a:
                    app_feats.append(prod[nd // 2:])
            elif packed_ok:
                plane = plane.astype(self.table_dtype)
                line = line.astype(self.table_dtype)
                prod = (grid_sample_2d_cf_quad(plane, uv)
                        * grid_sample_1d_cf_quad(line, zc))  # [C/2, N, 2]
                if has_d:
                    s = jnp.sum(prod[: nd // 2], (0, 2))
                    sigma = s if sigma is None else sigma + s
                if has_a:
                    app_feats.append(prod[nd // 2:])
            else:
                plane = plane.astype(self.table_dtype)
                line = line.astype(self.table_dtype)
                p = (grid_sample_2d_cf(plane, uv)
                     * grid_sample_1d_cf(line, zc)).astype(jnp.float32)
                if has_d:
                    s = jnp.sum(p[:nd], 0)
                    sigma = s if sigma is None else sigma + s
                if has_a:
                    # reshape to packed layout [C_a/2, N, 2] for the shared
                    # einsum below (C_a is even in all shipped configs)
                    ca = p.shape[0] - nd
                    app_feats.append(
                        p[nd:].reshape(ca // 2, 2, -1).transpose(0, 2, 1))
        app_pk = jnp.concatenate(app_feats, 0)  # [C_app/2, N, 2]
        w = params["basis_mat"]["w"]            # [C_app, app_dim]
        w_pk = w.reshape(-1, 2, w.shape[-1])    # [C_app/2, 2, app_dim]
        app_out = jnp.einsum("wns,wsd->dn", app_pk, w_pk,
                             preferred_element_type=jnp.float32)
        return sigma, app_out

    def feature2density(self, feat):
        if self.fea2dense == "softplus":
            return jnp.logaddexp(feat + self.density_shift, 0.0)
        if self.fea2dense == "relu":
            return jnp.maximum(feat, 0.0)
        if self.fea2dense == "relu_abs":
            return jnp.abs(feat)
        raise ValueError(self.fea2dense)

    # -- regularizer hooks (reference tensorf_base.py:1024-1057) ------------

    def density_l1(self, params):
        total = 0.0
        for i in self.active_density:
            total = total + jnp.mean(jnp.abs(params["density"][f"plane_{i}"]))
            total = total + jnp.mean(jnp.abs(params["density"][f"line_{i}"]))
        return total

    def tv_loss_density(self, params):
        return sum(_tv2d(params["density"][f"plane_{i}"]) * 1e-2
                   for i in self.active_density)

    def tv_loss_app(self, params):
        return sum(_tv2d(params["app"][f"plane_{i}"]) * 1e-2
                   for i in self.active_app)

    # -- forward -----------------------------------------------------------

    # -- fused eval path (static: degenerate-time-plane kernel) --------------

    def _fused_ok(self, x, ctx, render_kwargs):
        if not (self.fused_render and self._fused_eligible
                and not ctx.training):
            return False
        fields = render_kwargs.get("fields", [])
        if any(f != "distances" for f in fields):
            return False
        if render_kwargs.get("pred_weights_fields") or \
                render_kwargs.get("no_over_fields"):
            return False
        if "weights_shift" in x or "color_transform" in x:
            return False
        return True

    def apply_fused(self, params, x, ctx, render_kwargs):
        """Fused Pallas render for the single-axis static net: the z line
        factor ships as a TH=1 'time' table (its t-bilinear collapses to
        selecting the single real row), predicted sample weights ride
        pack row 14 (reference tensorf_no_sample.py:128-280)."""
        from hyperreel_tpu.ops.pallas.shade import (
            fused_shade_composite, build_scalar_pack)

        render_kwargs = render_kwargs or {}
        B = x["viewdirs"].shape[0]
        pts = x["points"].reshape(B, -1, 3)
        S = pts.shape[1]
        dists = x["distances"].reshape(B, S)
        viewdirs = x["viewdirs"].reshape(B, S, 3)
        weights = x["weights"].reshape(B, S) if "weights" in x \
            else jnp.ones((B, S), dists.dtype)

        xyz = self.normalize_coord(pts)
        e3 = jnp.eye(3, dtype=xyz.dtype)
        xn2, yn2, zn2 = (jnp.einsum("bsc,c->bs", xyz, e3[c])
                         for c in range(3))

        if len(self.active_density) > 1:
            return self._apply_fused_multi(params, x, ctx, render_kwargs,
                                           (xn2, yn2, zn2))

        # space quad table from plane_0 (density + app packed)
        space = jnp.concatenate(
            [params["density"]["plane_0"], params["app"]["plane_0"]], -1)
        H, W, C = space.shape
        p = jnp.pad(space.astype(jnp.bfloat16), ((1, 1), (1, 1), (0, 0)))
        qpack = jnp.concatenate(
            [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], -1)
        table = qpack.reshape((H + 1) * (W + 1), 4 * C)

        px = (xn2 + 1.0) * 0.5 * (W - 1)
        py = (yn2 + 1.0) * 0.5 * (H - 1)
        xi = (jnp.clip(jnp.floor(px), -1, W - 1) + 1).astype(jnp.int32)
        yi = (jnp.clip(jnp.floor(py), -1, H - 1) + 1).astype(jnp.int32)
        idx = (yi * (W + 1) + xi).reshape(-1)
        rows = table[idx]                                # [N, 4C] bf16

        # z line factor as a [1, L, C] degenerate time plane
        line = jnp.concatenate(
            [params["density"]["line_0"], params["app"]["line_0"]], -1)
        L = line.shape[0]
        tp = jnp.pad(line.astype(jnp.float32)[None],
                     ((1, 1), (1, 1), (0, 0)))          # [3, L+2, C]
        twp = ((L + 2 + 127) // 128) * 128
        ttab_t = jnp.pad(
            jnp.moveaxis(tp, -1, 1).reshape(3 * C, L + 2),
            ((0, 0), (0, twp - (L + 2))))

        w = params["basis_mat"]["w"].astype(jnp.float32)
        nd = self.density_n_comp[0]
        wb_t = jnp.concatenate(
            [jnp.zeros((w.shape[1], nd), jnp.float32), w.T], 1)
        wb_t = wb_t[_kmajor_perm(wb_t.shape[0])]

        vd_ray = viewdirs[:, 0, :]
        vd_rows = [jnp.broadcast_to(vd_ray[:, c:c + 1], (B, S)).reshape(-1)
                   for c in range(3)]
        if "color_scale" in x:
            cs3 = x["color_scale"].reshape(B, S, 3)
            csh3 = x["color_shift"].reshape(B, S, 3)
            e3c = jnp.eye(3, dtype=cs3.dtype)
            cs = tuple(jnp.einsum("bsc,c->bs", cs3, e3c[c]).reshape(-1)
                       for c in range(3))
            csh = tuple(jnp.einsum("bsc,c->bs", csh3, e3c[c]).reshape(-1)
                        for c in range(3))
        else:
            zero = jnp.zeros((B * S,), jnp.float32)
            cs = (zero, zero, zero)
            csh = (zero, zero, zero)

        pack = build_scalar_pack(
            xn2.reshape(-1), yn2.reshape(-1), zn2.reshape(-1),
            jnp.zeros((B * S,), jnp.float32), cs, csh, dists.reshape(-1),
            vd_rows, extra_rows=(weights.reshape(-1),))

        tile = 64
        scratch = twp * 6 + 3 * C * 4
        while tile > 1 and (B % tile != 0
                            or tile * S * scratch > 8 * (1 << 20)):
            tile //= 2

        out = fused_shade_composite(
            rows, pack, ttab_t, wb_t,
            S=S, W=W, H=H, TW=L, TH=1, n_density=nd,
            n_basis=(self._sh_deg + 1) ** 2
            if self.shading_mode == "SH" else 1,
            shading="sh" if self.shading_mode == "SH" else "rgb",
            density_shift=0.0,  # relu ignores the shift
            distance_scale=self.distance_scale, tile=tile,
            use_weights_row=True)

        return self._fused_out(out, x, B, S, render_kwargs)

    def _fused_out(self, out, x, B, S, render_kwargs):
        rgb_map = out[:3].T
        acc_map = out[3]
        if not self.black_bg and self.white_bg:
            rgb_map = rgb_map + (1.0 - acc_map[:, None])
        if "color_scale_global" in x:
            rgb_map = scale_shift_color_one(
                rgb_map,
                x["color_scale_global"].reshape(B, S, 3)[:, 0],
                x["color_shift_global"].reshape(B, S, 3)[:, 0])
        elif "color_transform_global" in x:
            rgb_map = transform_color_one(
                rgb_map,
                x["color_transform_global"].reshape(B, S, 3, 3)[:, 0],
                x["color_shift_global"].reshape(B, S, 3)[:, 0])
        rgb_map = jnp.clip(rgb_map, 0.0, 1.0)
        outputs = {"rgb": rgb_map}
        if "distances" in render_kwargs.get("fields", []):
            outputs["distances"] = out[4][:, None]
        return outputs

    def _apply_fused_multi(self, params, x, ctx, render_kwargs, comps):
        """Multi-axis static fused render: per-axis quad gathers + VMEM
        line tables (ops/pallas/shade.py fused_shade_composite_multi;
        reference tensorf_base.py:1059-1148 full VM decomposition)."""
        from hyperreel_tpu.ops.pallas.shade import (
            fused_shade_composite_multi, build_scalar_pack)
        xn2, yn2, zn2 = comps
        B = x["viewdirs"].shape[0]
        S = x["points"].reshape(B, -1, 3).shape[1]
        dists = x["distances"].reshape(B, S)
        viewdirs = x["viewdirs"].reshape(B, S, 3)
        weights = x["weights"].reshape(B, S) if "weights" in x \
            else jnp.ones((B, S), dists.dtype)
        comp = (xn2, yn2, zn2)

        rows_list, line_tabs, grid_dims, line_lens = [], [], [], []
        dens_c, app_c = [], []
        for i in self.active_density:
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            plane = jnp.concatenate(
                [params["density"][f"plane_{i}"],
                 params["app"][f"plane_{i}"]], -1)
            H, W, C = plane.shape
            pq = jnp.pad(plane.astype(jnp.bfloat16),
                         ((1, 1), (1, 1), (0, 0)))
            qpack = jnp.concatenate(
                [pq[:-1, :-1], pq[:-1, 1:], pq[1:, :-1], pq[1:, 1:]], -1)
            table = qpack.reshape((H + 1) * (W + 1), 4 * C)
            px = (comp[m0] + 1.0) * 0.5 * (W - 1)
            py = (comp[m1] + 1.0) * 0.5 * (H - 1)
            xi = (jnp.clip(jnp.floor(px), -1, W - 1) + 1).astype(jnp.int32)
            yi = (jnp.clip(jnp.floor(py), -1, H - 1) + 1).astype(jnp.int32)
            rows_list.append(table[(yi * (W + 1) + xi).reshape(-1)])
            grid_dims.append((W, H))
            line = jnp.concatenate(
                [params["density"][f"line_{i}"],
                 params["app"][f"line_{i}"]], -1)
            L = line.shape[0]
            lp = ((L + 2 + 127) // 128) * 128
            line_tabs.append(jnp.pad(
                line.astype(jnp.float32).T, ((0, 0), (1, lp - L - 1))))
            line_lens.append(L)
            dens_c.append(self.density_n_comp[i])
            app_c.append(self.app_n_comp[i])

        w = params["basis_mat"]["w"].astype(jnp.float32)
        wb_t = w.T                                   # [3K, sum app_c]
        wb_t = wb_t[_kmajor_perm(wb_t.shape[0])]

        vd_ray = viewdirs[:, 0, :]
        vd_rows = [jnp.broadcast_to(vd_ray[:, c:c + 1], (B, S)).reshape(-1)
                   for c in range(3)]
        if "color_scale" in x:
            cs3 = x["color_scale"].reshape(B, S, 3)
            csh3 = x["color_shift"].reshape(B, S, 3)
            e3c = jnp.eye(3, dtype=cs3.dtype)
            cs = tuple(jnp.einsum("bsc,c->bs", cs3, e3c[c]).reshape(-1)
                       for c in range(3))
            csh = tuple(jnp.einsum("bsc,c->bs", csh3, e3c[c]).reshape(-1)
                        for c in range(3))
        else:
            zero = jnp.zeros((B * S,), jnp.float32)
            cs = (zero, zero, zero)
            csh = (zero, zero, zero)

        pack = build_scalar_pack(
            xn2.reshape(-1), yn2.reshape(-1), zn2.reshape(-1),
            jnp.zeros((B * S,), jnp.float32), cs, csh, dists.reshape(-1),
            vd_rows, extra_rows=(weights.reshape(-1),))

        tile = 64
        scratch = sum(t.shape[1] * 6 + t.shape[0] * 4 for t in line_tabs)
        while tile > 1 and (B % tile != 0
                            or tile * S * scratch > 8 * (1 << 20)):
            tile //= 2

        out = fused_shade_composite_multi(
            rows_list, pack, line_tabs, wb_t,
            axes=self.active_density, S=S, grid_dims=grid_dims,
            line_lens=line_lens, dens_c=dens_c, app_c=app_c,
            n_basis=(self._sh_deg + 1) ** 2
            if self.shading_mode == "SH" else 1,
            shading="sh" if self.shading_mode == "SH" else "rgb",
            density_shift=0.0, distance_scale=self.distance_scale,
            tile=tile, use_weights_row=True)
        return self._fused_out(out, x, B, S, render_kwargs)

    def apply(self, params, x, ctx, render_kwargs=None):
        render_kwargs = render_kwargs or {}
        if self._fused_ok(x, ctx, render_kwargs or {}):
            return self.apply_fused(params, x, ctx, render_kwargs)
        B = x["viewdirs"].shape[0]
        pts = x["points"].reshape(B, -1, 3)
        S = pts.shape[1]
        dists = x["distances"].reshape(B, S)
        deltas = jnp.concatenate(
            [dists[..., 1:] - dists[..., :-1],
             jnp.full_like(dists[:, :1], 1e10)], -1)
        viewdirs = x["viewdirs"].reshape(B, S, 3)
        # configs whose extract_fields drops "weights" (e.g. blender_voxel)
        # mean uniform sample weights
        weights = x["weights"].reshape(B, S) if "weights" in x \
            else jnp.ones((B, S), dists.dtype)

        ray_valid = self.valid_mask(pts) & (dists > 0)

        # top-k weight filtering (tensorf_no_sample.py:159-167)
        if self.apply_filter_weights:
            kth = jax.lax.top_k(weights, self.filter_max_samples)[0][..., -1:]
            filt = (weights >= (kth - 1e-8)) & (weights > self.filter_weight_thresh)
            active = ctx.it >= self.filter_wait_iters
            ray_valid = ray_valid & jnp.where(active, filt,
                                              jnp.ones_like(filt))

        xyz = self.normalize_coord(pts)
        feat_flat, app_cf = self._sample_density_and_app_cf(
            params, xyz.reshape(-1, 3))
        feat = feat_flat.reshape(B, S)
        feat = feat * weights
        if "weights_shift" in x:
            feat = feat + x["weights_shift"].reshape(B, S)
        sigma = jnp.where(ray_valid, self.feature2density(feat), 0.0)

        alpha, weight, bg_weight = raw2alpha(sigma, deltas * self.distance_scale)
        app_mask = weight > self.ray_march_weight_thres

        if self.shading_mode == "SH":
            from hyperreel_tpu.ops.sh import sh_render_cf
            rgb = sh_render_cf(viewdirs.reshape(-1, 3), app_cf,
                               deg=self._sh_deg).reshape(B, S, 3)
        else:
            app_feat = app_cf.T.reshape(B, S, self.app_dim)
            rgb = self.render_fn(params.get("render"), xyz, viewdirs,
                                 app_feat, render_kwargs)
        rgb = jnp.where(app_mask[..., None], rgb, 0.0)

        if "color_scale" in x:
            rgb = scale_shift_color_all(
                rgb,
                x["color_scale"].reshape(B, S, 3),
                x["color_shift"].reshape(B, S, 3))
        elif "color_transform" in x:
            rgb = transform_color_all(
                rgb,
                x["color_transform"].reshape(B, S, 3, 3),
                x["color_shift"].reshape(B, S, 3))

        acc_map = jnp.sum(weight, -1)
        rgb_map = jnp.sum(weight[..., None] * rgb, -2)

        # white-background (coin flip per batch in training,
        # tensorf_no_sample.py:236)
        if not self.black_bg:
            if self.white_bg:
                rgb_map = rgb_map + (1.0 - acc_map[:, None])
            elif ctx.training:
                coin = jax.random.uniform(jax.random.fold_in(ctx.rng, 202), ()) < 0.5
                rgb_map = jnp.where(coin,
                                    rgb_map + (1.0 - acc_map[:, None]),
                                    rgb_map)

        if "color_scale_global" in x:
            rgb_map = scale_shift_color_one(
                rgb_map,
                x["color_scale_global"].reshape(B, S, 3)[:, 0],
                x["color_shift_global"].reshape(B, S, 3)[:, 0])
        elif "color_transform_global" in x:
            rgb_map = transform_color_one(
                rgb_map,
                x["color_transform_global"].reshape(B, S, 3, 3)[:, 0],
                x["color_shift_global"].reshape(B, S, 3)[:, 0])

        if not ctx.training:
            rgb_map = jnp.clip(rgb_map, 0.0, 1.0)

        outputs = {"rgb": rgb_map}
        fields = render_kwargs.get("fields", [])
        no_over = render_kwargs.get("no_over_fields", [])
        pred_w = render_kwargs.get("pred_weights_fields", [])
        if fields:
            if pred_w:
                pw = alpha2weights(weights)
            for key in fields:
                if key == "render_weights":
                    outputs[key] = weight
                elif key in no_over:
                    outputs[key] = x[key].reshape(B, -1)
                elif key in pred_w:
                    outputs[key] = jnp.sum(
                        pw[..., None] * x[key].reshape(B, S, -1), -2)
                else:
                    outputs[key] = jnp.sum(
                        weight[..., None] * x[key].reshape(B, S, -1), -2)
        return outputs

    # -- host-side grid events (reference tensorf_base.py:509-553) ----------

    def upsample(self, params, new_grid_size):
        """Bilinear upsample all planes/lines to the new resolution
        (reference tensorf_base.py:1151-1188)."""
        new = {k: dict(v) if isinstance(v, dict) else v
               for k, v in params.items()}
        for fam, comps in (("density", self.density_n_comp),
                           ("app", self.app_n_comp)):
            for i in range(3):
                if comps[i] == 0:
                    continue
                m0, m1 = MAT_MODE[i]
                v = VEC_MODE[i]
                new[fam][f"plane_{i}"] = resize_bilinear_2d(
                    params[fam][f"plane_{i}"],
                    new_grid_size[m1], new_grid_size[m0])
                new[fam][f"line_{i}"] = resize_linear_1d(
                    params[fam][f"line_{i}"], new_grid_size[v])
        self.grid_size = list(new_grid_size)
        return new

    def shrink(self, params, new_aabb):
        """Crop grids to a tightened aabb (reference
        tensorf_base.py:1190-1232)."""
        aabb = np.asarray(self.aabb, np.float64)
        gs = np.asarray(self.grid_size)
        units = (aabb[1] - aabb[0]) / (gs - 1)
        t_l = np.round(np.round((np.asarray(new_aabb[0]) - aabb[0]) / units)).astype(int)
        b_r = (np.round((np.asarray(new_aabb[1]) - aabb[0]) / units)).astype(int) + 1
        b_r = np.minimum(b_r, gs)
        t_l = np.maximum(t_l, 0)

        new = {k: dict(v) if isinstance(v, dict) else v
               for k, v in params.items()}
        for fam, comps in (("density", self.density_n_comp),
                           ("app", self.app_n_comp)):
            for i in range(3):
                if comps[i] == 0:
                    continue
                m0, m1 = MAT_MODE[i]
                v = VEC_MODE[i]
                new[fam][f"plane_{i}"] = params[fam][f"plane_{i}"][
                    t_l[m1]:b_r[m1], t_l[m0]:b_r[m0], :]
                new[fam][f"line_{i}"] = params[fam][f"line_{i}"][
                    t_l[v]:b_r[v], :]

        t_l_r = t_l / (gs - 1)
        b_r_r = (b_r - 1) / (gs - 1)
        corrected = np.stack([
            (1 - t_l_r) * aabb[0] + t_l_r * aabb[1],
            (1 - b_r_r) * aabb[0] + b_r_r * aabb[1],
        ]).astype(np.float32)
        self.aabb = corrected
        self.grid_size = [int(x) for x in (b_r - t_l)]
        return new

    def compute_alpha_grid(self, params, grid_size=(200, 200, 200)):
        """Dense alpha evaluation + 3^3 max-pool + threshold; returns
        (alpha binary volume [D,H,W] with D=z, new_aabb)
        (reference tensorf_base.py:384-429)."""
        gx, gy, gz = grid_size
        aabb = jnp.asarray(self.aabb)
        xs = jnp.linspace(0.0, 1.0, gx)
        ys = jnp.linspace(0.0, 1.0, gy)
        zs = jnp.linspace(0.0, 1.0, gz)
        grid = jnp.stack(jnp.meshgrid(xs, ys, zs, indexing="ij"), -1)
        pts = aabb[0] * (1 - grid) + aabb[1] * grid  # [gx, gy, gz, 3]

        def row_alpha(row_pts):
            xyz = self.normalize_coord(row_pts.reshape(-1, 3))
            feat = self._sample_density(params, xyz)
            sigma = self.feature2density(feat)
            return (1.0 - jnp.exp(-sigma * 0.01)).reshape(gy, gz)

        alpha = jax.lax.map(row_alpha, pts)  # [gx, gy, gz]
        alpha = jnp.clip(alpha, 0.0, 1.0)
        # transpose to [gz, gy, gx] (torch volume convention D,H,W)
        alpha_t = jnp.transpose(alpha, (2, 1, 0))
        pooled = jax.lax.reduce_window(
            alpha_t, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
        binary = (pooled >= self.alpha_mask_thres).astype(jnp.float32)

        occupied = binary > 0.5
        pts_t = jnp.transpose(pts, (2, 1, 0, 3))
        big = jnp.full((3,), jnp.inf)
        mins = jnp.min(jnp.where(occupied[..., None], pts_t, big[None, None, None]),
                       axis=(0, 1, 2))
        maxs = jnp.max(jnp.where(occupied[..., None], pts_t, -big[None, None, None]),
                       axis=(0, 1, 2))
        return binary, jnp.stack([mins, maxs])



def _coord_cols(flat, dim):
    """Split [N, dim] coords into per-axis flat arrays.

    Goes through ONE explicit channels-first concatenate: letting each
    consumer column-slice the row-major coords makes the TPU backend
    materialize the [dim, N] relayout as a while loop over dynamic
    slices (~8 ms at 8.4M samples for dim=4); the concatenate form lowers
    to a plain relayout copy.
    """
    cf = jnp.concatenate([flat[:, j].reshape(1, -1) for j in range(dim)], 0)
    return [cf[j] for j in range(dim)]

def _tv2d(plane_hwc):
    """Mean squared difference TV (reference utils/tensorf_utils.py:150-166:
    TVLoss with weight 1, h/w counts)."""
    h_tv = jnp.mean((plane_hwc[1:, :, :] - plane_hwc[:-1, :, :]) ** 2)
    w_tv = jnp.mean((plane_hwc[:, 1:, :] - plane_hwc[:, :-1, :]) ** 2)
    return 2.0 * (h_tv + w_tv)


# ---------------------------------------------------------------------------
# Dynamic net: TensorVMKeyframeTime
# ---------------------------------------------------------------------------

MAT_MODE_SPACE = ((0, 1), (0, 2), (1, 2))
MAT_MODE_TIME = ((2, 3), (1, 3), (0, 3))


@dataclass
class TensorVMKeyframeTime(TensorVMNoSample):
    """Dynamic HyperReel color net (reference nlf/nets/tensorf_dynamic.py):
    4-D (x, y, z, t_keyframe) factorization into space-plane x time-plane
    products, density/color decoded per frame via linear/Fourier time bases.
    """

    num_keyframes: int = 1
    total_num_frames: int = 1

    def __post_init__(self):
        cfg = dict(self.cfg)
        self.frames_per_keyframe = int(cfg.get(
            "frames_per_keyframe",
            max(self.total_num_frames // max(self.num_keyframes, 1), 1)))
        self.time_scale_factor = (self.total_num_frames - 1) / self.total_num_frames
        self.time_pixel_offset = 0.5 / self.num_keyframes

        self.density_mode = cfg.get("densityMode", "Density")
        if self.density_mode == "Density":
            self.data_dim_density = 1
        elif self.density_mode == "DensityLinear":
            self.data_dim_density = 2
        elif self.density_mode == "DensityFourier":
            self.data_dim_density = self.frames_per_keyframe * 2 + 1
        else:
            raise ValueError(self.density_mode)

        shading = cfg.get("shadingMode", "SH")
        if shading == "RGBtLinear":
            cfg["data_dim_color"] = 2 * 3
        elif shading == "RGBtFourier":
            cfg["data_dim_color"] = (self.frames_per_keyframe * 2 + 1) * 3
        self.cfg = cfg
        super().__post_init__()

        if shading == "RGBtLinear":
            self.render_fn, _ = _shading_rgbt_linear()
            self.render_init = None
        elif shading == "RGBtFourier":
            self.render_fn, _ = _shading_rgbt_fourier()
            self.render_init = None

        if self.density_mode == "Density":
            self.density_decode = _density_plain
        elif self.density_mode == "DensityLinear":
            self.density_decode = _density_linear
        else:
            self.density_decode = _density_fourier

        # Fused Pallas eval path (ops/pallas/shade.py): one kernel replaces
        # the time-plane HBM gather, the u32 relayout copies, the corner
        # reduce, SH shading, and the composite. Static eligibility only;
        # runtime conditions are checked per call in _fused_ok.
        self.fused_render = bool(cfg.get("fused_render", False))
        self._fused_eligible = (
            self.density_mode == "Density"
            and self.shading_mode in ("SH", "RGB")
            and len(self.active_density) >= 1
            and self.active_density == self.active_app
            and self.table_kind == "bf16"
            and not self.apply_filter_weights
            and self.ray_march_weight_thres == 0.0
            and self.fea2dense == "relu")

    # -- params ------------------------------------------------------------

    def _init_vm_time(self, key, n_comp, scale, uniform=False):
        params = {}
        gs = self.grid_size
        K = self.num_keyframes
        for i in range(3):
            if n_comp[i] == 0:
                continue
            ms0, ms1 = MAT_MODE_SPACE[i]
            mt0, _ = MAT_MODE_TIME[i]
            k1, k2, key = jax.random.split(key, 3)
            if uniform:
                space = jnp.clip(
                    scale * jax.random.uniform(k1, (gs[ms1], gs[ms0], n_comp[i])),
                    1e-2, 1e8)
                time = jnp.clip(
                    scale * jax.random.uniform(k2, (K, gs[mt0], n_comp[i])),
                    1e-2, 1e8)
            else:
                space = scale * jax.random.normal(k1, (gs[ms1], gs[ms0], n_comp[i]))
                time = scale * jax.random.normal(k2, (K, gs[mt0], n_comp[i]))
            params[f"space_{i}"] = space
            params[f"time_{i}"] = time
        return params

    def init(self, key):
        kd, ka, kb, kbd, kr = jax.random.split(key, 5)
        if self.fea2dense == "softplus":
            density = self._init_vm_time(kd, self.density_n_comp, 0.1)
        else:
            density = self._init_vm_time(kd, self.density_n_comp, 1e-2,
                                         uniform=True)
        app = self._init_vm_time(ka, self.app_n_comp, 0.1)
        params = {
            "density": density,
            "app": app,
            "basis_mat": _linear_init(kb, sum(self.app_n_comp), self.app_dim,
                                      bias=False),
        }
        if self.density_mode != "Density":
            params["basis_mat_density"] = _linear_init(
                kbd, sum(self.density_n_comp), self.data_dim_density, bias=False)
        if self.render_init is not None:
            params["render"] = self.render_init(kr)
        return params

    def param_groups(self, params):
        groups = {
            "density": jax.tree.map(lambda _: "color", params["density"]),
            "app": jax.tree.map(lambda _: "color", params["app"]),
        }
        impl = "color_impl" if "MLP" in self.shading_mode else "color"
        groups["basis_mat"] = jax.tree.map(lambda _: impl, params["basis_mat"])
        if "basis_mat_density" in params:
            groups["basis_mat_density"] = jax.tree.map(
                lambda _: impl, params["basis_mat_density"])
        if "render" in params:
            groups["render"] = jax.tree.map(lambda _: "color_impl",
                                            params["render"])
        return groups

    # -- sampling ----------------------------------------------------------

    def normalize_time_coord(self, t):
        """(reference tensorf_dynamic.py:615-616)."""
        return (t * self.time_scale_factor + self.time_pixel_offset) * 2.0 - 1.0

    def _sample_family_cf(self, params, fam, active, flat_xyzt):
        """Space-plane x time-plane products, channels-first [C_tot, N]."""
        feats = []
        for i in active:
            ms0, ms1 = MAT_MODE_SPACE[i]
            mt0, mt1 = MAT_MODE_TIME[i]
            uv_s = jnp.stack([flat_xyzt[:, ms0], flat_xyzt[:, ms1]], -1)
            uv_t = jnp.stack([flat_xyzt[:, mt0], flat_xyzt[:, mt1]], -1)
            ps = grid_sample_2d_cf(params[fam][f"space_{i}"], uv_s)
            pt = grid_sample_2d_cf(params[fam][f"time_{i}"], uv_t)
            feats.append(ps * pt)
        return jnp.concatenate(feats, 0)

    def _sample_density_t(self, params, xyzt):
        shape = xyzt.shape[:-1]
        feat_cf = self._sample_family_cf(
            params, "density", self.active_density, xyzt.reshape(-1, 4))
        if self.density_mode != "Density":
            w = params["basis_mat_density"]["w"]
            out_cf = jnp.einsum("cn,cd->dn", feat_cf, w,
                                preferred_element_type=jnp.float32)
            return out_cf.T.reshape(shape + (self.data_dim_density,))
        return jnp.sum(feat_cf, 0).reshape(shape)[..., None]

    def _sample_app_t_cf(self, params, flat_xyzt):
        feat_cf = self._sample_family_cf(
            params, "app", self.active_app, flat_xyzt)
        w = params["basis_mat"]["w"]
        return jnp.einsum("cn,cd->dn", feat_cf, w,
                          preferred_element_type=jnp.float32)

    def _sample_app_t(self, params, xyzt):
        shape = xyzt.shape[:-1]
        app_cf = self._sample_app_t_cf(params, xyzt.reshape(-1, 4))
        return app_cf.T.reshape(shape + (self.app_dim,))

    def _sample_density_and_app_t_cf(self, params, flat_xyzt):
        """Fused density + app sampling with packed space/time gathers
        (see TensorVMNoSample._sample_density_and_app_cf). Returns
        (density_feat_cf [data_dim_density-or-raw, N], app_cf [app_dim, N]).
        """
        cols = _coord_cols(flat_xyzt, 4)
        dens_feats = []
        app_feats = []
        for i in range(3):
            has_d = i in self.active_density
            has_a = i in self.active_app
            if not (has_d or has_a):
                continue
            ms0, ms1 = MAT_MODE_SPACE[i]
            mt0, mt1 = MAT_MODE_TIME[i]
            uv_s = jnp.stack([cols[ms0], cols[ms1]], -1)
            uv_t = jnp.stack([cols[mt0], cols[mt1]], -1)
            nd = self.density_n_comp[i] if has_d else 0
            if has_d and has_a:
                space = jnp.concatenate(
                    [params["density"][f"space_{i}"],
                     params["app"][f"space_{i}"]], -1)
                timep = jnp.concatenate(
                    [params["density"][f"time_{i}"],
                     params["app"][f"time_{i}"]], -1)
            elif has_d:
                space = params["density"][f"space_{i}"]
                timep = params["density"][f"time_{i}"]
            else:
                space = params["app"][f"space_{i}"]
                timep = params["app"][f"time_{i}"]
            C_tot = space.shape[-1]
            packed_ok = C_tot % 2 == 0 and nd % 2 == 0
            if packed_ok and self.table_kind == "int8" \
                    and C_tot % 4 == 0:
                prod = (grid_sample_2d_cf_quad_int8(space, uv_s)
                        * grid_sample_2d_cf_quad_int8(timep, uv_t))
                if has_d:
                    dens_feats.append(prod[: nd // 2])
                if has_a:
                    app_feats.append(prod[nd // 2:])
            elif packed_ok:
                space = space.astype(self.table_dtype)
                timep = timep.astype(self.table_dtype)
                prod = (grid_sample_2d_cf_quad(space, uv_s)
                        * grid_sample_2d_cf_quad(timep, uv_t))
                if has_d:
                    dens_feats.append(prod[: nd // 2])
                if has_a:
                    app_feats.append(prod[nd // 2:])
            else:
                space = space.astype(self.table_dtype)
                timep = timep.astype(self.table_dtype)
                p = (grid_sample_2d_cf(space, uv_s)
                     * grid_sample_2d_cf(timep, uv_t)).astype(jnp.float32)
                if has_d:
                    dens_feats.append(
                        p[:nd].reshape(nd // 2, 2, -1).transpose(0, 2, 1))
                if has_a:
                    ca = p.shape[0] - nd
                    app_feats.append(
                        p[nd:].reshape(ca // 2, 2, -1).transpose(0, 2, 1))

        dens_pk = jnp.concatenate(dens_feats, 0)  # [C_d/2, N, 2]
        if self.density_mode != "Density":
            wd = params["basis_mat_density"]["w"]
            wd_pk = wd.reshape(-1, 2, wd.shape[-1])
            dens_out = jnp.einsum("wns,wsd->dn", dens_pk, wd_pk,
                                  preferred_element_type=jnp.float32)
        else:
            dens_out = jnp.sum(dens_pk, (0, 2))[None]
        app_pk = jnp.concatenate(app_feats, 0)
        w = params["basis_mat"]["w"]
        w_pk = w.reshape(-1, 2, w.shape[-1])
        app_out = jnp.einsum("wns,wsd->dn", app_pk, w_pk,
                             preferred_element_type=jnp.float32)
        return dens_out, app_out

    # -- fused eval path -----------------------------------------------------

    def _fused_ok(self, x, ctx, render_kwargs):
        if not (self.fused_render and self._fused_eligible
                and not ctx.training):
            return False
        fields = render_kwargs.get("fields", [])
        # "distances" composited under render weights = depth, computed
        # in-kernel; anything else needs the general path
        if any(f != "distances" for f in fields):
            return False
        if render_kwargs.get("pred_weights_fields") or \
                render_kwargs.get("no_over_fields"):
            return False
        # per-sample 3x3 color transforms aren't wired into the kernel
        return "color_transform" not in x

    def _apply_fused_multi_time(self, params, x, ctx, render_kwargs,
                                comps, tn2):
        """Multi-axis DYNAMIC fused render (the immersive/neural_3d
        [8, 4, 4] family): per-axis space quad gathers + per-axis time
        planes as VMEM tables with the separable z-two-hot + tn mix
        (ops/pallas/shade.py fused_shade_composite_multi time_hs;
        reference tensorf_dynamic.py:287-371)."""
        from hyperreel_tpu.ops.pallas.shade import (
            fused_shade_composite_multi, build_scalar_pack)
        xn2, yn2, zn2 = comps
        B = x["viewdirs"].shape[0]
        S = x["points"].reshape(B, -1, 3).shape[1]
        dists = x["distances"].reshape(B, S)
        viewdirs = x["viewdirs"].reshape(B, S, 3)
        comp = (xn2, yn2, zn2)

        rows_list, ttabs, grid_dims, line_lens, time_hs = \
            [], [], [], [], []
        dens_c, app_c = [], []
        for i in self.active_density:
            ms0, ms1 = MAT_MODE_SPACE[i]
            mt0, _ = MAT_MODE_TIME[i]
            plane = jnp.concatenate(
                [params["density"][f"space_{i}"],
                 params["app"][f"space_{i}"]], -1)
            H, W, C = plane.shape
            pq = jnp.pad(plane.astype(jnp.bfloat16),
                         ((1, 1), (1, 1), (0, 0)))
            qpack = jnp.concatenate(
                [pq[:-1, :-1], pq[:-1, 1:], pq[1:, :-1], pq[1:, 1:]], -1)
            table = qpack.reshape((H + 1) * (W + 1), 4 * C)
            px = (comp[ms0] + 1.0) * 0.5 * (W - 1)
            py = (comp[ms1] + 1.0) * 0.5 * (H - 1)
            xi = (jnp.clip(jnp.floor(px), -1, W - 1) + 1).astype(jnp.int32)
            yi = (jnp.clip(jnp.floor(py), -1, H - 1) + 1).astype(jnp.int32)
            rows_list.append(table[(yi * (W + 1) + xi).reshape(-1)])
            grid_dims.append((W, H))

            timep = jnp.concatenate(
                [params["density"][f"time_{i}"],
                 params["app"][f"time_{i}"]], -1)
            TH, TW, _ = timep.shape
            tp = jnp.pad(timep.astype(jnp.float32),
                         ((1, 1), (1, 1), (0, 0)))
            twp = ((TW + 2 + 127) // 128) * 128
            ttabs.append(jnp.pad(
                jnp.moveaxis(tp, -1, 1).reshape((TH + 2) * C, TW + 2),
                ((0, 0), (0, twp - (TW + 2)))))
            line_lens.append(TW)
            time_hs.append(TH)
            dens_c.append(self.density_n_comp[i])
            app_c.append(self.app_n_comp[i])

        w = params["basis_mat"]["w"].astype(jnp.float32)
        wb_t = w.T                                     # [3K, sum app_c]
        wb_t = wb_t[_kmajor_perm(wb_t.shape[0])]

        vd_ray = viewdirs[:, 0, :]
        vd_rows = [jnp.broadcast_to(vd_ray[:, c:c + 1], (B, S)).reshape(-1)
                   for c in range(3)]
        if "color_scale" in x:
            cs3 = x["color_scale"].reshape(B, S, 3)
            csh3 = x["color_shift"].reshape(B, S, 3)
            e3c = jnp.eye(3, dtype=cs3.dtype)
            cs = tuple(jnp.einsum("bsc,c->bs", cs3, e3c[c]).reshape(-1)
                       for c in range(3))
            csh = tuple(jnp.einsum("bsc,c->bs", csh3, e3c[c]).reshape(-1)
                        for c in range(3))
        else:
            zero = jnp.zeros((B * S,), jnp.float32)
            cs = (zero, zero, zero)
            csh = (zero, zero, zero)

        pack = build_scalar_pack(
            xn2.reshape(-1), yn2.reshape(-1), zn2.reshape(-1),
            tn2.reshape(-1), cs, csh, dists.reshape(-1), vd_rows)

        tile = 64
        scratch = sum(t.shape[1] * 6 + t.shape[0] * 4 for t in ttabs)
        while tile > 1 and (B % tile != 0
                            or tile * S * scratch > 8 * (1 << 20)):
            tile //= 2

        out = fused_shade_composite_multi(
            rows_list, pack, ttabs, wb_t,
            axes=self.active_density, S=S, grid_dims=grid_dims,
            line_lens=line_lens, time_hs=time_hs, dens_c=dens_c,
            app_c=app_c,
            n_basis=(self._sh_deg + 1) ** 2
            if self.shading_mode == "SH" else 1,
            shading="sh" if self.shading_mode == "SH" else "rgb",
            density_shift=0.0, distance_scale=self.distance_scale,
            tile=tile)
        return self._fused_out(out, x, B, S, render_kwargs)

    def apply_fused(self, params, x, ctx, render_kwargs):
        """Fused Pallas render (eval): XLA keeps the embedding outputs and
        the space-plane quad-row gather; the kernel does the time-plane
        four-hot lookup, bilinear reduce, basis matmul, SH shading, color
        scale/shift, and the composite (ops/pallas/shade.py; replaces the
        XLA chain of reference nlf/nets/tensorf_dynamic.py:287-371)."""
        from hyperreel_tpu.ops.pallas.shade import (
            fused_shade_composite, build_scalar_pack)

        render_kwargs = render_kwargs or {}
        B = x["viewdirs"].shape[0]
        pts = x["points"].reshape(B, -1, 3)
        S = pts.shape[1]
        base_times = x["base_times"].reshape(B, S)
        dists = x["distances"].reshape(B, S)
        viewdirs = x["viewdirs"].reshape(B, S, 3)

        import os
        coord_dot = os.environ.get("HYPERREEL_COORD_DOT", "1") not in (
            "0", "false")

        xyz = self.normalize_coord(pts)                      # [B, S, 3]
        tn2 = self.normalize_time_coord(base_times)          # [B, S]
        if len(self.active_density) > 1:
            e3m = jnp.eye(3, dtype=xyz.dtype)
            comps = tuple(jnp.einsum("bsc,c->bs", xyz, e3m[c])
                          for c in range(3))
            return self._apply_fused_multi_time(
                params, x, ctx, render_kwargs, comps, tn2)
        if coord_dot:
            # component extraction as a minor-axis reduce (dot with a
            # one-hot) instead of a stride-3 slice: the slice form makes
            # XLA canonicalize to the [N, 3] -> [3, N] transpose
            # while-loop (~4 ms/chunk; PERFORMANCE.md round-1 notes)
            e3 = jnp.eye(3, dtype=xyz.dtype)
            xn2, yn2, zn2 = (jnp.einsum("bsc,c->bs", xyz, e3[c])
                             for c in range(3))
        else:
            xn2, yn2, zn2 = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        # validity (aabb + dist > 0) is derived in-kernel from the coords

        # space quad table (bf16, corner-major; ops/grid_sample.py:241-307)
        space = jnp.concatenate(
            [params["density"]["space_0"], params["app"]["space_0"]], -1)
        H, W, C = space.shape
        p = jnp.pad(space.astype(jnp.bfloat16), ((1, 1), (1, 1), (0, 0)))
        qpack = jnp.concatenate(
            [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], -1)
        table = qpack.reshape((H + 1) * (W + 1), 4 * C)

        px = (xn2 + 1.0) * 0.5 * (W - 1)
        py = (yn2 + 1.0) * 0.5 * (H - 1)
        xi = (jnp.clip(jnp.floor(px), -1, W - 1) + 1).astype(jnp.int32)
        yi = (jnp.clip(jnp.floor(py), -1, H - 1) + 1).astype(jnp.int32)
        idx = (yi * (W + 1) + xi).reshape(-1)                # [N]
        rows = table[idx]                                    # [N, 4C] bf16

        # time plane, zero-ring padded, keyframe-major rows (row k*C + c),
        # z on lanes — the kernel's separable z-two-hot layout (tiny)
        timep = jnp.concatenate(
            [params["density"]["time_0"], params["app"]["time_0"]], -1)
        TH, TW, _ = timep.shape
        tp = jnp.pad(timep.astype(jnp.float32), ((1, 1), (1, 1), (0, 0)))
        twp = ((TW + 2 + 127) // 128) * 128
        ttab_t = jnp.pad(
            jnp.moveaxis(tp, -1, 1).reshape((TH + 2) * C, TW + 2),
            ((0, 0), (0, twp - (TW + 2))))

        # transposed basis matrix with zeroed density columns: [3K, C]
        w = params["basis_mat"]["w"].astype(jnp.float32)     # [C_app, 3K]
        nd = self.density_n_comp[0]
        wb_t = jnp.concatenate(
            [jnp.zeros((w.shape[1], nd), jnp.float32), w.T], 1)
        wb_t = wb_t[_kmajor_perm(wb_t.shape[0])]

        # viewdir component rows ([N] each); SH basis is computed in-kernel.
        # viewdirs are the ray direction broadcast to every sample
        # (CreateRays/AddPointOutputs), so extract per-RAY (a [B, 3]
        # strided read, 32x smaller than [N, 3]) and re-broadcast
        vd_ray = viewdirs[:, 0, :]                           # [B, 3]
        vd_rows = [jnp.broadcast_to(vd_ray[:, c:c + 1], (B, S)).reshape(-1)
                   for c in range(3)]

        if "color_scale" in x:
            cs3 = x["color_scale"].reshape(B, S, 3)
            csh3 = x["color_shift"].reshape(B, S, 3)
            if coord_dot:
                e3c = jnp.eye(3, dtype=cs3.dtype)
                cs = tuple(jnp.einsum("bsc,c->bs", cs3, e3c[c]).reshape(-1)
                           for c in range(3))
                csh = tuple(
                    jnp.einsum("bsc,c->bs", csh3, e3c[c]).reshape(-1)
                    for c in range(3))
            else:
                cs = tuple(cs3[..., c].reshape(-1) for c in range(3))
                csh = tuple(csh3[..., c].reshape(-1) for c in range(3))
        else:
            zero = jnp.zeros((B * S,), jnp.float32)
            cs = (zero, zero, zero)   # rgb * (0 + 1) + 0
            csh = (zero, zero, zero)

        pack = build_scalar_pack(
            xn2.reshape(-1), yn2.reshape(-1), zn2.reshape(-1),
            tn2.reshape(-1), cs, csh, dists.reshape(-1), vd_rows)

        # tile: sized so the [TWp, tile*S] z-two-hot scratch + keyframe
        # z-features stay in VMEM
        tile = 64
        scratch = twp * 6 + (TH + 2) * C * 4
        while tile > 1 and (B % tile != 0
                            or tile * S * scratch > 8 * (1 << 20)):
            tile //= 2

        out = fused_shade_composite(
            rows, pack, ttab_t, wb_t,
            S=S, W=W, H=H, TW=TW, TH=TH, n_density=nd,
            n_basis=(self._sh_deg + 1) ** 2
            if self.shading_mode == "SH" else 1,
            shading="sh" if self.shading_mode == "SH" else "rgb",
            density_shift=0.0,  # fea2dense == relu (no shift)
            distance_scale=self.distance_scale, tile=tile)

        res = out                                            # [8, B]
        rgb_map = res[:3].T                                  # [B, 3]
        acc_map = res[3]
        if not self.black_bg and self.white_bg:
            rgb_map = rgb_map + (1.0 - acc_map[:, None])

        if "color_scale_global" in x:
            rgb_map = scale_shift_color_one(
                rgb_map,
                x["color_scale_global"].reshape(B, S, 3)[:, 0],
                x["color_shift_global"].reshape(B, S, 3)[:, 0])
        elif "color_transform_global" in x:
            rgb_map = transform_color_one(
                rgb_map,
                x["color_transform_global"].reshape(B, S, 3, 3)[:, 0],
                x["color_shift_global"].reshape(B, S, 3)[:, 0])

        rgb_map = jnp.clip(rgb_map, 0.0, 1.0)
        outputs = {"rgb": rgb_map}
        if "distances" in render_kwargs.get("fields", []):
            outputs["distances"] = res[4][:, None]
        return outputs

    # -- forward -----------------------------------------------------------

    def apply(self, params, x, ctx, render_kwargs=None):
        render_kwargs = render_kwargs or {}
        if self._fused_ok(x, ctx, render_kwargs or {}):
            return self.apply_fused(params, x, ctx, render_kwargs)
        B = x["viewdirs"].shape[0]
        pts = x["points"].reshape(B, -1, 3)
        S = pts.shape[1]
        base_times = x["base_times"].reshape(B, S, 1)
        dists = x["distances"].reshape(B, S)
        deltas = jnp.concatenate(
            [dists[..., 1:] - dists[..., :-1],
             jnp.full_like(dists[:, :1], 1e10)], -1)
        times = x["times"].reshape(B, S, 1)
        time_offset = x["time_offset"].reshape(B, S, 1)
        viewdirs = x["viewdirs"].reshape(B, S, 3)

        ray_valid = self.valid_mask(pts) & (dists > 0)

        # predicted weights are overridden to ones in the dynamic net
        # (reference tensorf_dynamic.py:702-709 "TODO: maybe remove")
        weights = jnp.ones((B, S), pts.dtype)
        if self.apply_filter_weights:
            w_pred = x["weights"].reshape(B, S)
            kth = jax.lax.top_k(w_pred, self.filter_max_samples)[0][..., -1:]
            filt = (w_pred >= (kth - 1e-8)) & (w_pred > self.filter_weight_thresh)
            active = ctx.it >= self.filter_wait_iters
            ray_valid = ray_valid & jnp.where(active, filt,
                                              jnp.ones_like(filt))

        xyzt = jnp.concatenate(
            [self.normalize_coord(pts),
             self.normalize_time_coord(base_times)], -1)

        kw = {
            "frames_per_keyframe": self.frames_per_keyframe,
            "num_keyframes": self.num_keyframes,
            "total_num_frames": self.total_num_frames,
            "times": times,
            "time_offset": time_offset,
        }

        dens_cf, app_cf = self._sample_density_and_app_t_cf(
            params, xyzt.reshape(-1, 4))
        feat = dens_cf.T.reshape(B, S, -1)
        sigma_raw = self.density_decode(feat, kw) * weights
        sigma = jnp.where(ray_valid, self.feature2density(sigma_raw), 0.0)

        alpha, weight, bg_weight = raw2alpha(sigma, deltas * self.distance_scale)
        app_mask = weight > self.ray_march_weight_thres

        if self.shading_mode == "SH":
            from hyperreel_tpu.ops.sh import sh_render_cf
            rgb = sh_render_cf(viewdirs.reshape(-1, 3), app_cf,
                               deg=self._sh_deg).reshape(B, S, 3)
        else:
            app_feat = app_cf.T.reshape(B, S, self.app_dim)
            rgb = self.render_fn(params.get("render"), xyzt, viewdirs,
                                 app_feat, kw)
        rgb = jnp.where(app_mask[..., None], rgb, 0.0)

        if "color_scale" in x:
            rgb = scale_shift_color_all(
                rgb,
                x["color_scale"].reshape(B, S, 3),
                x["color_shift"].reshape(B, S, 3))
        elif "color_transform" in x:
            rgb = transform_color_all(
                rgb,
                x["color_transform"].reshape(B, S, 3, 3),
                x["color_shift"].reshape(B, S, 3))

        acc_map = jnp.sum(weight, -1)
        rgb_map = jnp.sum(weight[..., None] * rgb, -2)

        if not self.black_bg:
            if self.white_bg:
                rgb_map = rgb_map + (1.0 - acc_map[:, None])
            elif ctx.training:
                coin = jax.random.uniform(jax.random.fold_in(ctx.rng, 202), ()) < 0.5
                rgb_map = jnp.where(coin,
                                    rgb_map + (1.0 - acc_map[:, None]),
                                    rgb_map)

        if "color_scale_global" in x:
            rgb_map = scale_shift_color_one(
                rgb_map,
                x["color_scale_global"].reshape(B, S, 3)[:, 0],
                x["color_shift_global"].reshape(B, S, 3)[:, 0])
        elif "color_transform_global" in x:
            rgb_map = transform_color_one(
                rgb_map,
                x["color_transform_global"].reshape(B, S, 3, 3)[:, 0],
                x["color_shift_global"].reshape(B, S, 3)[:, 0])

        if not ctx.training:
            rgb_map = jnp.clip(rgb_map, 0.0, 1.0)

        outputs = {"rgb": rgb_map}
        fields = render_kwargs.get("fields", [])
        no_over = render_kwargs.get("no_over_fields", [])
        pred_w = render_kwargs.get("pred_weights_fields", [])
        if fields:
            if pred_w:
                pw = alpha2weights(x["weights"].reshape(B, S))
            for key in fields:
                if key == "render_weights":
                    outputs[key] = weight
                elif key in no_over:
                    outputs[key] = x[key].reshape(B, -1)
                elif key in pred_w:
                    outputs[key] = jnp.sum(
                        pw[..., None] * x[key].reshape(B, S, -1), -2)
                else:
                    outputs[key] = jnp.sum(
                        weight[..., None] * x[key].reshape(B, S, -1), -2)
        return outputs

    # -- grid events -------------------------------------------------------

    def upsample(self, params, new_grid_size):
        """(reference tensorf_dynamic.py:395-440)."""
        new = {k: dict(v) if isinstance(v, dict) else v
               for k, v in params.items()}
        for fam, comps in (("density", self.density_n_comp),
                           ("app", self.app_n_comp)):
            for i in range(3):
                if comps[i] == 0:
                    continue
                ms0, ms1 = MAT_MODE_SPACE[i]
                mt0, _ = MAT_MODE_TIME[i]
                new[fam][f"space_{i}"] = resize_bilinear_2d(
                    params[fam][f"space_{i}"],
                    new_grid_size[ms1], new_grid_size[ms0])
                new[fam][f"time_{i}"] = resize_bilinear_2d(
                    params[fam][f"time_{i}"],
                    self.num_keyframes, new_grid_size[mt0])
        self.grid_size = list(new_grid_size)
        return new

    def shrink(self, params, new_aabb):
        """Dynamic net never shrinks in the reference shipped configs
        (update_AlphaMask only tightens aabb on the static net); keep grids
        and only tighten aabb."""
        self.aabb = np.asarray(new_aabb, np.float32)
        return params

    def density_l1(self, params):
        total = 0.0
        for i in self.active_density:
            total = total + jnp.mean(jnp.abs(params["density"][f"space_{i}"]))
            total = total + jnp.mean(jnp.abs(params["density"][f"time_{i}"]))
        return total

    def tv_loss_density(self, params):
        return sum(_tv2d(params["density"][f"space_{i}"]) * 1e-2
                   for i in self.active_density)

    def tv_loss_app(self, params):
        return sum(_tv2d(params["app"][f"space_{i}"]) * 1e-2
                   for i in self.active_app)

    def compute_alpha_grid(self, params, grid_size=(200, 200, 200)):
        """Dense alpha across keyframes: max over time
        (reference tensorf_dynamic.py:442-520 getDenseAlpha loops frames)."""
        gx, gy, gz = grid_size
        aabb = jnp.asarray(self.aabb)
        xs = jnp.linspace(0.0, 1.0, gx)
        ys = jnp.linspace(0.0, 1.0, gy)
        zs = jnp.linspace(0.0, 1.0, gz)
        grid = jnp.stack(jnp.meshgrid(xs, ys, zs, indexing="ij"), -1)
        pts = aabb[0] * (1 - grid) + aabb[1] * grid

        t_norm = self.normalize_time_coord(
            jnp.linspace(0.0, 1.0, self.num_keyframes))

        def row_alpha(row_pts):
            xyz = self.normalize_coord(row_pts.reshape(-1, 3))

            def one_t(t):
                xyzt = jnp.concatenate(
                    [xyz, jnp.full_like(xyz[..., :1], t)], -1)
                feat = self._sample_density_t(params, xyzt)
                kw = {"times": jnp.zeros_like(xyz[..., :1]),
                      "time_offset": jnp.zeros_like(xyz[..., :1]),
                      "frames_per_keyframe": self.frames_per_keyframe,
                      "num_keyframes": self.num_keyframes,
                      "total_num_frames": self.total_num_frames}
                sigma = self.feature2density(self.density_decode(feat, kw))
                return 1.0 - jnp.exp(-sigma * 0.01)

            a = jnp.max(jax.vmap(one_t)(t_norm), 0)
            return a.reshape(gy, gz)

        alpha = jax.lax.map(row_alpha, pts)
        alpha = jnp.clip(alpha, 0.0, 1.0)
        alpha_t = jnp.transpose(alpha, (2, 1, 0))
        pooled = jax.lax.reduce_window(
            alpha_t, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
        binary = (pooled >= self.alpha_mask_thres).astype(jnp.float32)
        occupied = binary > 0.5
        pts_t = jnp.transpose(pts, (2, 1, 0, 3))
        big = jnp.full((3,), jnp.inf)
        mins = jnp.min(jnp.where(occupied[..., None], pts_t, big[None, None, None]),
                       axis=(0, 1, 2))
        maxs = jnp.max(jnp.where(occupied[..., None], pts_t, -big[None, None, None]),
                       axis=(0, 1, 2))
        return binary, jnp.stack([mins, maxs])


net_dict = {
    "tensor_vm_split_no_sample": TensorVMNoSample,
    "tensor_vm_split_time": TensorVMKeyframeTime,
}


def build_color_net(cfg, dataset_info=None):
    dataset_info = dataset_info or {}
    t = cfg["type"]
    if t == "tensor_vm_split_no_sample":
        return TensorVMNoSample(cfg=dict(cfg))
    if t == "tensor_vm_split_time":
        return TensorVMKeyframeTime(
            cfg=dict(cfg),
            num_keyframes=int(dataset_info.get("num_keyframes", 1)),
            total_num_frames=int(dataset_info.get("num_frames", 1)),
        )
    if t in ("tensor_vm", "tensor_cp", "tensor_vm_split_reflect",
             "tensor_vm_split"):
        from hyperreel_tpu.models import tensorf_extra  # registers variants
        return net_dict[t](cfg=dict(cfg))
    if t == "multiple":
        # cascade of nets with wait/stop gating
        # (reference nlf/nets/nets.py:36-134 MultipleNet)
        from hyperreel_tpu.models.tensorf_extra import MultipleNet
        sub = [build_color_net(nc, dataset_info) for nc in cfg["nets"]]
        waits = [float(nc.get("wait_iters", 0)) for nc in cfg["nets"]]
        stops = [float(nc.get("stop_iters", float("inf")))
                 for nc in cfg["nets"]]
        scales = [float(nc.get("scale", 1.0)) for nc in cfg["nets"]]
        return MultipleNet(nets=sub, wait_iters=waits, stop_iters=stops,
                           scales=scales)
    raise ValueError(f"unknown color net type {t}")
