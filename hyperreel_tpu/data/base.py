"""Dataset base classes (reference: datasets/base.py).

All datasets precompute per-pixel rays into flat numpy arrays
`all_inputs = [coords | rgb(3) | weight(1)]` (reference
datasets/base.py:111-143); the train split samples random rows with
replacement (reference RandomSampler(replacement=True),
nlf/__init__.py:222-237), val/test yield whole images.

TPU note: batches are materialized as numpy and shipped once per step; the
sampler index generation is pure numpy (no torch DataLoader workers needed —
ray stores are memory-resident arrays and slicing is the only work).
"""

from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np


@dataclass
class RayDataset:
    """In-memory ray store."""

    all_coords: np.ndarray  # [N, 6/7/8]
    all_rgb: np.ndarray     # [N, 3]
    all_weights: Optional[np.ndarray] = None  # [N, 1]
    img_wh: tuple = (0, 0)
    num_images: int = 0
    # dataset_info fields consumed by model builders
    num_keyframes: int = 1
    num_frames: int = 1
    num_views: int = 1
    near: float = 0.0
    far: float = 1.0
    depth_range: tuple = (0.0, 1.0)
    extras: Dict[str, np.ndarray] = field(default_factory=dict)
    # camera-to-world poses [V, 3, 4] and intrinsics [3, 3] when the loader
    # exposes them (used by spiral/render-path generation)
    poses: Optional[np.ndarray] = None
    intrinsics: Optional[np.ndarray] = None
    # (fx, fy, near) when the ray store is in NDC space — render paths must
    # push generated rays through the same transform (reference
    # datasets/base.py get_coords_from_camera applies to_ndc)
    ndc_params: Optional[tuple] = None
    # lightfield camera-grid structure (rows x cols), set by grid-shaped
    # loaders (stanford) — the EPI visualizer extracts ground-truth EPIs
    # from it (reference nlf/visualizers/epipolar.py:93-101)
    num_rows: Optional[int] = None
    num_cols: Optional[int] = None

    def __post_init__(self):
        if self.all_weights is None:
            self.all_weights = np.ones(
                (self.all_coords.shape[0], 1), np.float32)

    @property
    def num_rays(self):
        return self.all_coords.shape[0]

    def info(self):
        return {
            "num_keyframes": self.num_keyframes,
            "num_frames": self.num_frames,
            "num_views": self.num_views,
            "near": self.near,
            "far": self.far,
            "depth_range": self.depth_range,
        }

    def batch_iterator(self, batch_size, seed=0,
                       replacement=True) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite sampler over rays (replacement=True mirrors the
        reference's RandomSampler)."""
        rng = np.random.default_rng(seed)
        n = self.num_rays
        while True:
            if replacement:
                idx = rng.integers(0, n, batch_size)
            else:
                idx = rng.permutation(n)[:batch_size]
            batch = {
                "rays": self.all_coords[idx],
                "rgb": self.all_rgb[idx],
                "weights": self.all_weights[idx],
            }
            for k, v in self.extras.items():
                batch[k] = v[idx]
            yield batch

    def image(self, i):
        """Whole-image rays/rgb for validation (reference
        datasets/base.py:248-276)."""
        W, H = self.img_wh
        n = W * H
        sl = slice(i * n, (i + 1) * n)
        return {
            "rays": self.all_coords[sl],
            "rgb": self.all_rgb[sl],
        }
