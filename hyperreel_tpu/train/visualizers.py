"""Validation-time visualizers (reference: nlf/visualizers/).

Each visualizer produces numpy images from a trained state through the
chunked Renderer; the System writes them as PNGs next to val images.
"""

import os
from dataclasses import dataclass

import numpy as np

from hyperreel_tpu.ops.ray_math import get_epi_rays


def _normalize_img(x):
    lo, hi = np.percentile(x, 1), np.percentile(x, 99)
    return np.clip((x - lo) / max(hi - lo, 1e-8), 0, 1)


def get_warp_dimensions(embedding, k=3):
    """Pick the top-variance channels for visualization
    (reference utils/visualization.py:11-23)."""
    flat = embedding.reshape(-1, embedding.shape[-1])
    var = flat.var(0)
    return list(np.argsort(var)[::-1][:k])


def visualize_warp(embedding, dims):
    """Normalize selected channels into an RGB image
    (reference utils/visualization.py:25-52)."""
    sel = embedding[..., dims]
    return _normalize_img(sel)


@dataclass
class EmbeddingVisualizer:
    """Render per-stage embedding outputs and visualize the top-variance
    channels (reference nlf/visualizers/embedding.py:37-111)."""

    cfg: dict

    def render(self, system, state, rays, wh):
        fields = list(self.cfg.get("fields", ["points"]))
        out = system.renderer.render_rays(
            state.params, rays, it=state.it, fields=fields)
        W, H = wh
        images = {}
        for f in fields:
            emb = out[f].reshape(H, W, -1)
            dims = get_warp_dimensions(emb)
            images[f"embedding_{f}"] = visualize_warp(emb, dims)
        return images


@dataclass
class EPIVisualizer:
    """Epipolar-plane image slices (reference
    nlf/visualizers/epipolar.py:20-141)."""

    cfg: dict

    def render(self, system, state, rays, wh):
        W, H = wh
        v = float(self.cfg.get("v", 0.0))
        t = float(self.cfg.get("t", 0.0))
        st_scale = float(self.cfg.get("st_scale", 1.0))
        epi_rays = get_epi_rays(W, v, H, t, aspect=W / H,
                                st_scale=st_scale).astype(np.float32)
        width = system.train_dataset.all_coords.shape[-1]
        if width > 6:
            pad = np.zeros((epi_rays.shape[0], width - 6), np.float32)
            epi_rays = np.concatenate([epi_rays, pad], -1)
        out = system.renderer.render_rays(state.params, epi_rays, it=state.it)
        return {"epi": np.clip(out["rgb"].reshape(H, W, 3), 0, 1)}


@dataclass
class FocusVisualizer:
    """Synthetic refocusing by averaging light-field samples at a focal
    plane (reference nlf/visualizers/focus.py:13-160)."""

    cfg: dict

    def render(self, system, state, rays, wh):
        W, H = wh
        shifts = self.cfg.get("shifts", [0.0, 0.5, 1.0])
        base = rays.reshape(H, W, -1)
        acc = np.zeros((H, W, 3), np.float32)
        n = 0
        for s in shifts:
            shifted = base.copy()
            shifted[..., 0] += s * 0.01
            out = system.renderer.render_rays(
                state.params, shifted.reshape(-1, base.shape[-1]),
                it=state.it)
            acc += out["rgb"].reshape(H, W, 3)
            n += 1
        return {"focus": np.clip(acc / n, 0, 1)}


@dataclass
class ClosestViewVisualizer:
    """Nearest training view for a rendered pose
    (reference nlf/visualizers/closest_view.py:12-60)."""

    cfg: dict

    def render(self, system, state, rays, wh):
        ds = system.train_dataset
        W, H = wh
        n_per = W * H
        target_o = rays[:, :3].mean(0)
        best, best_d = 0, np.inf
        for i in range(ds.num_images):
            o = ds.all_coords[i * n_per:(i + 1) * n_per, :3]
            if len(o) < n_per:
                break
            d = np.linalg.norm(o.mean(0) - target_o)
            if d < best_d:
                best, best_d = i, d
        img = ds.all_rgb[best * n_per:(best + 1) * n_per]
        if img.shape[0] == n_per:
            return {"closest_view": img.reshape(H, W, 3)}
        return {}


@dataclass
class TensorVisualizer:
    """Dump raw feature planes as images
    (reference nlf/visualizers/tensor.py:12-70)."""

    cfg: dict

    def render(self, system, state, rays, wh):
        images = {}
        color = state.params["color"]
        for fam in ("density", "app"):
            for key, arr in color.get(fam, {}).items():
                arr = np.asarray(arr)
                if arr.ndim == 3:
                    img = _normalize_img(arr[..., :3] if arr.shape[-1] >= 3
                                         else arr[..., :1].repeat(3, -1))
                    images[f"tensor_{fam}_{key}"] = img
        return images


visualizer_dict = {
    "embedding": EmbeddingVisualizer,
    "epipolar": EPIVisualizer,
    "focus": FocusVisualizer,
    "closest_view": ClosestViewVisualizer,
    "tensor": TensorVisualizer,
}


def build_visualizers(cfgs):
    out = []
    for name, cfg in (cfgs or {}).items():
        t = cfg.get("type", name)
        out.append((name, visualizer_dict[t](cfg=dict(cfg))))
    return out
