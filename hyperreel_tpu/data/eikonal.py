"""Eikonal dataset (reference: datasets/eikonal.py) — LLFF-style
poses_bounds with an optional cap on the number of views and auto img_wh
from the first image (eikonal.py:26-80)."""

from hyperreel_tpu.data.llff import load_llff


def load_eikonal(root_dir, split="train", downsample=1, num_views=None,
                 use_ndc=False, val_skip=8, **kwargs):
    ds = load_llff(root_dir, split=split, downsample=downsample,
                   use_ndc=use_ndc, val_skip=val_skip, **kwargs)
    if num_views is not None and split == "train":
        W, H = ds.img_wh
        n = min(num_views, ds.num_images) * W * H
        ds.all_coords = ds.all_coords[:n]
        ds.all_rgb = ds.all_rgb[:n]
        ds.all_weights = ds.all_weights[:n]
        ds.num_images = min(num_views, ds.num_images)
    return ds
