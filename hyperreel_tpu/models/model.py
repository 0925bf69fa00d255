"""Model composition (reference: nlf/models/models.py).

LightfieldModel: forward(rays) = color_net(embedding_chain(param(rays))).
Functional: `.init(key) -> params`, `.apply(params, rays, ctx, kwargs)`.
`param_groups` labels every leaf with its optimizer group for
optax.multi_transform (mirroring the reference's named opt_group attrs,
nlf/__init__.py:374-388).
"""

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hyperreel_tpu.models.embeddings import build_embedding_chain
from hyperreel_tpu.models.ray_param import get_ray_param
from hyperreel_tpu.models.tensorf import build_color_net


@dataclass
class LightfieldModel:
    cfg: dict
    dataset_info: Optional[dict] = None
    compute_dtype: Optional[jnp.dtype] = None

    def __post_init__(self):
        cfg = self.cfg
        self.ray_param = get_ray_param(cfg.get("param", {"fn": "identity"}))
        self.embedding = build_embedding_chain(
            cfg["embedding"], self.dataset_info, self.compute_dtype)
        self.color_net = build_color_net(cfg["color"]["net"], self.dataset_info)
        # channels-first fused EVAL fast path (models/fused_eval.py):
        # built when the chain matches the flagship pattern structurally;
        # falls back to the stage chain otherwise
        self._cf_eval = None
        if cfg["color"]["net"].get("fused_render_cf", True):
            from hyperreel_tpu.models import fused_eval
            if fused_eval.cf_eligible(self):
                self._cf_eval = fused_eval.FusedCFEval(self)

    def init(self, key):
        k_embed, k_color = jax.random.split(key)
        return {
            "embedding": self.embedding.init(k_embed),
            "color": self.color_net.init(k_color),
        }

    def apply(self, params, rays, ctx, render_kwargs=None):
        render_kwargs = render_kwargs or {}
        if not render_kwargs.get("no_param") and self._cf_eval is not None \
                and self._cf_eval.ok(ctx, render_kwargs):
            return self._cf_eval.apply(params, rays, ctx, render_kwargs)
        # no_param: rays arrive already in parameter space (the warp
        # level-set regularizer jitters param rays and re-renders —
        # reference nlf/__init__.py render(no_param=True))
        if not render_kwargs.get("no_param"):
            rays = self.ray_param.apply(rays)
        # embed_params is a per-RAY field (the LocalAffine tform+bias,
        # warp regularizers) — route it around the color net, whose
        # fields machinery assumes per-sample layout
        want_ep = "embed_params" in render_kwargs.get("fields", ())
        x = self.embedding.apply(params["embedding"], rays, ctx, render_kwargs)
        ep = x.pop("embed_params", None) if isinstance(x, dict) else None
        color_kwargs = render_kwargs
        if want_ep:
            color_kwargs = dict(render_kwargs)
            color_kwargs["fields"] = [f for f in render_kwargs["fields"]
                                      if f != "embed_params"]
        out = self.color_net.apply(params["color"], x, ctx, color_kwargs)
        if want_ep and ep is not None:
            out["embed_params"] = ep
        return out

    def prepare_eval(self, params):
        """Per-checkpoint serving prep: prebuilt fused-eval table arrays
        (FusedCFEval.prepare), or None when the fast path is absent.
        Ship the result to apply via render_kwargs["cf_prepared"]."""
        if self._cf_eval is None:
            return None
        return self._cf_eval.prepare(params)

    def embed(self, params, rays, ctx, render_kwargs=None):
        """Run only the embedding chain — used by visualizers and the
        geometry regularizers (reference render_fn.embed paths)."""
        render_kwargs = render_kwargs or {}
        rays = self.ray_param.apply(rays)
        return self.embedding.apply(params["embedding"], rays, ctx,
                                    render_kwargs)

    def param_groups(self, params):
        embed_groups = {}
        for name, stage in self.embedding.stages:
            group = getattr(stage, "group", "embedding")
            # nets configured with their own group (e.g. embedding_impl for
            # the ray MLP, reference conf model yaml net.group)
            stage_params = params["embedding"][name]
            embed_groups[name] = jax.tree.map(lambda _: group, stage_params)
        return {
            "embedding": embed_groups,
            "color": self.color_net.param_groups(params["color"]),
        }


model_dict = {"lightfield": LightfieldModel}


def build_model(cfg, dataset_info=None, compute_dtype=None):
    t = cfg.get("type", "lightfield")
    return model_dict[t](cfg=cfg, dataset_info=dataset_info,
                         compute_dtype=compute_dtype)
