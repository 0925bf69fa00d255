"""Additional factored-grid net variants for capability parity
(reference: nlf/nets/tensorf_base.py TensorVM/TensorCP,
nlf/nets/tensorf_reflect.py, nlf/nets/nets.py MultipleNet).

Per the config-usage census (SURVEY.md §2.10) none of these are exercised
by shipped configs; they are provided for API parity and custom configs.
"""

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp

from hyperreel_tpu.models.mlp import _linear_init, _linear_apply
from hyperreel_tpu.models.tensorf import (
    TensorVMNoSample, MAT_MODE, VEC_MODE, net_dict)
from hyperreel_tpu.ops.grid_sample import grid_sample_2d, grid_sample_1d


class _GenericFusedSampling:
    """Fallback for variants with non-standard factor storage: route the
    fused density+app hook through the variant's own samplers."""

    def _sample_density_and_app_cf(self, params, flat_xyz):
        sigma = self._sample_density(params, flat_xyz)
        app_nd = self._sample_app(params, flat_xyz)  # [N, app_dim]
        return sigma, app_nd.T


@dataclass
class TensorVMJoint(_GenericFusedSampling, TensorVMNoSample):
    """Joint-plane TensorVM: one [3, C_app+C_sigma, R, R] plane stack and
    matching lines (reference tensorf_base.py:623-861). Reuses the
    no-sample forward; only the factor storage/sampling differ."""

    def __post_init__(self):
        cfg = dict(self.cfg)
        self.n_comp_density = int(cfg.get("n_lamb_sigma", [8])[0]
                                  if isinstance(cfg.get("n_lamb_sigma"), list)
                                  else cfg.get("n_lamb_sigma", 8))
        self.n_comp_app = int(cfg.get("n_lamb_sh", [24])[0]
                              if isinstance(cfg.get("n_lamb_sh"), list)
                              else cfg.get("n_lamb_sh", 24))
        cfg["n_lamb_sigma"] = [self.n_comp_density] * 3
        cfg["n_lamb_sh"] = [self.n_comp_app] * 3
        self.cfg = cfg
        super().__post_init__()

    def init(self, key):
        k1, k2, kb, kr = jax.random.split(key, 4)
        res = max(self.grid_size)
        C = self.n_comp_app + self.n_comp_density
        params = {
            "plane_coef": 0.1 * jax.random.normal(k1, (3, res, res, C)),
            "line_coef": 0.1 * jax.random.normal(k2, (3, res, C)),
            "basis_mat": _linear_init(kb, self.n_comp_app * 3, self.app_dim,
                                      bias=False),
        }
        if self.render_init is not None:
            params["render"] = self.render_init(kr)
        return params

    def param_groups(self, params):
        groups = {
            "plane_coef": "color",
            "line_coef": "color",
            "basis_mat": jax.tree.map(lambda _: "color_impl",
                                      params["basis_mat"]),
        }
        if "render" in params:
            groups["render"] = jax.tree.map(lambda _: "color_impl",
                                            params["render"])
        return groups

    def _sample_density(self, params, xyz):
        feat = None
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            uv = jnp.stack([xyz[..., m0], xyz[..., m1]], -1)
            p = grid_sample_2d(params["plane_coef"][i], uv)
            l = grid_sample_1d(params["line_coef"][i], xyz[..., v])
            s = jnp.sum(p[..., -self.n_comp_density:]
                        * l[..., -self.n_comp_density:], -1)
            feat = s if feat is None else feat + s
        return feat

    def _sample_app(self, params, xyz):
        feats = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            v = VEC_MODE[i]
            uv = jnp.stack([xyz[..., m0], xyz[..., m1]], -1)
            p = grid_sample_2d(params["plane_coef"][i], uv)
            l = grid_sample_1d(params["line_coef"][i], xyz[..., v])
            feats.append(p[..., : self.n_comp_app]
                         * l[..., : self.n_comp_app])
        feat = jnp.concatenate(feats, -1)
        return _linear_apply(params["basis_mat"], feat)

    def upsample(self, params, new_grid_size):
        from hyperreel_tpu.ops.grid_sample import (
            resize_bilinear_2d, resize_linear_1d)
        res = max(new_grid_size)
        new = dict(params)
        new["plane_coef"] = jnp.stack([
            resize_bilinear_2d(params["plane_coef"][i], res, res)
            for i in range(3)])
        new["line_coef"] = jnp.stack([
            resize_linear_1d(params["line_coef"][i], res)
            for i in range(3)])
        self.grid_size = [res, res, res]
        return new


@dataclass
class TensorCP(_GenericFusedSampling, TensorVMNoSample):
    """CP-rank decomposition: products of three line factors
    (reference tensorf_base.py:1235-1415)."""

    def __post_init__(self):
        cfg = dict(self.cfg)
        n_sig = cfg.get("n_lamb_sigma", 96)
        n_app = cfg.get("n_lamb_sh", 288)
        self.n_comp_density = int(n_sig[0] if isinstance(n_sig, list) else n_sig)
        self.n_comp_app = int(n_app[0] if isinstance(n_app, list) else n_app)
        cfg["n_lamb_sigma"] = [self.n_comp_density] * 3
        cfg["n_lamb_sh"] = [self.n_comp_app] * 3
        self.cfg = cfg
        super().__post_init__()

    def init(self, key):
        kd, ka, kb, kr = jax.random.split(key, 4)
        gs = self.grid_size
        params = {
            "density_line": [
                0.2 * jax.random.normal(jax.random.fold_in(kd, i),
                                        (gs[VEC_MODE[i]], self.n_comp_density))
                for i in range(3)],
            "app_line": [
                0.2 * jax.random.normal(jax.random.fold_in(ka, i),
                                        (gs[VEC_MODE[i]], self.n_comp_app))
                for i in range(3)],
            "basis_mat": _linear_init(kb, self.n_comp_app, self.app_dim,
                                      bias=False),
        }
        if self.render_init is not None:
            params["render"] = self.render_init(kr)
        return params

    def param_groups(self, params):
        groups = {
            "density_line": ["color"] * 3,
            "app_line": ["color"] * 3,
            "basis_mat": jax.tree.map(lambda _: "color_impl",
                                      params["basis_mat"]),
        }
        if "render" in params:
            groups["render"] = jax.tree.map(lambda _: "color_impl",
                                            params["render"])
        return groups

    def _sample_density(self, params, xyz):
        prod = None
        for i in range(3):
            l = grid_sample_1d(params["density_line"][i],
                               xyz[..., VEC_MODE[i]])
            prod = l if prod is None else prod * l
        return jnp.sum(prod, -1)

    def _sample_app(self, params, xyz):
        prod = None
        for i in range(3):
            l = grid_sample_1d(params["app_line"][i], xyz[..., VEC_MODE[i]])
            prod = l if prod is None else prod * l
        return _linear_apply(params["basis_mat"], prod)

    def upsample(self, params, new_grid_size):
        from hyperreel_tpu.ops.grid_sample import resize_linear_1d
        new = dict(params)
        new["density_line"] = [
            resize_linear_1d(params["density_line"][i],
                             new_grid_size[VEC_MODE[i]])
            for i in range(3)]
        new["app_line"] = [
            resize_linear_1d(params["app_line"][i],
                             new_grid_size[VEC_MODE[i]])
            for i in range(3)]
        self.grid_size = list(new_grid_size)
        return new


@dataclass
class TensorVMReflect(TensorVMNoSample):
    """RefNeRF-style variant: density normals from the density-field
    gradient, reflected viewdirs shading (reference
    nlf/nets/tensorf_reflect.py:28-201). On TPU the normal is jax.grad of
    the density w.r.t. position — no autograd.grad special-casing."""

    def density_and_normal(self, params, xyz, weights):
        def density_at(p):
            feat = self._sample_density(params, p[None])[0]
            return self.feature2density(feat * weights)

        def one(p, w):
            def f(q):
                feat = self._sample_density(params, q[None])[0]
                return self.feature2density(feat * w)

            d, g = jax.value_and_grad(f)(p)
            # safe_norm: jnp.linalg.norm's sqrt VJP NaNs at g = 0 (flat
            # density regions are common early in training) — see
            # ops/intersect_math.py safe_norm rationale
            from hyperreel_tpu.ops.intersect_math import safe_norm
            n = -g / safe_norm(g, axis=-1, keepdims=False)
            return d, n

        flat_xyz = xyz.reshape(-1, 3)
        flat_w = weights.reshape(-1)
        d, n = jax.vmap(one)(flat_xyz, flat_w)
        return d.reshape(xyz.shape[:-1]), n.reshape(xyz.shape)

    def apply(self, params, x, ctx, render_kwargs=None):
        render_kwargs = render_kwargs or {}
        B = x["viewdirs"].shape[0]
        pts = x["points"].reshape(B, -1, 3)
        xyz = self.normalize_coord(pts)
        weights = x["weights"].reshape(B, -1)
        _, normal = self.density_and_normal(params, xyz, weights)
        d = x["viewdirs"].reshape(B, -1, 3)
        refl = d - 2.0 * jnp.sum(d * normal, -1, keepdims=True) * normal
        x = dict(x)
        x["viewdirs"] = refl
        return super().apply(params, x, ctx, render_kwargs)


@dataclass
class MultipleNet:
    """Cascade of dict-input COLOR nets with wait/stop iters and per-net
    scales (reference nlf/nets/nets.py:36-134 applied to the tensorf
    family). Outputs of active nets are scale-summed; gating is a
    where-blend on the traced iteration; each sub-net sees the shifted
    iteration `it - wait_iters[i]` (reference set_iter offset,
    nets.py:133-134). The tensor-input variant with feature feedback
    lives in models/mlp.py MultipleNet."""

    nets: List
    wait_iters: List[float]
    stop_iters: List[float]
    scales: List[float] = None

    def init(self, key):
        keys = jax.random.split(key, len(self.nets))
        return {f"net_{i}": n.init(k)
                for i, (n, k) in enumerate(zip(self.nets, keys))}

    def apply(self, params, x, ctx, render_kwargs=None):
        from dataclasses import replace as dc_replace
        scales = self.scales or [1.0] * len(self.nets)
        out = None
        for i, net in enumerate(self.nets):
            ctx_i = dc_replace(ctx,
                               it=ctx.it - jnp.int32(self.wait_iters[i]))
            o = net.apply(params[f"net_{i}"], x, ctx_i, render_kwargs)
            gate = ((ctx.it >= self.wait_iters[i])
                    & (ctx.it < self.stop_iters[i])).astype(jnp.float32)
            rgb = o["rgb"] * (gate * scales[i])
            if out is None:
                out = dict(o)
                out["rgb"] = rgb
            else:
                out["rgb"] = out["rgb"] + rgb
        return out

    def param_groups(self, params):
        return {f"net_{i}": n.param_groups(params[f"net_{i}"])
                for i, n in enumerate(self.nets)}


@dataclass
class TensorVMStandalone(TensorVMNoSample):
    """Classic TensoRF forward with its OWN ray marching (reference
    TensorBase.forward + sample_ray/sample_ray_ndc,
    tensorf_base.py:330-380,555-620): stratified samples between near/far,
    then the shared no-sample render core. Lets the factored grids train
    without a sample-prediction network (`tensor_vm_split` standalone mode).
    """

    def __post_init__(self):
        super().__post_init__()
        cfg = self.cfg
        self.near_far = list(cfg.get("near_far", [2.0, 6.0]))
        self.n_samples = int(cfg.get("nSamples", 128))
        self.ndc_ray = bool(cfg.get("ndc_ray", 0))

    def march(self, params, rays, ctx, render_kwargs=None):
        """rays [B, 6+] -> render outputs (self-sampled)."""
        B = rays.shape[0]
        near, far = self.near_far
        t = jnp.linspace(near, far, self.n_samples)
        t = jnp.broadcast_to(t, (B, self.n_samples))
        if ctx.training:
            jitter = jax.random.uniform(ctx.rng, (B, self.n_samples)) * (
                (far - near) / self.n_samples)
            t = t + jitter
        pts = rays[:, None, :3] + rays[:, None, 3:6] * t[..., None]
        x = {
            "points": pts,
            "distances": t[..., None],
            "viewdirs": jnp.broadcast_to(rays[:, None, 3:6], pts.shape),
            "weights": jnp.ones((B, self.n_samples, 1)),
        }
        return self.apply(params, x, ctx, render_kwargs)


# register
net_dict["tensor_vm"] = TensorVMJoint
net_dict["tensor_cp"] = TensorCP
net_dict["tensor_vm_split_reflect"] = TensorVMReflect
net_dict["tensor_vm_split"] = TensorVMStandalone
