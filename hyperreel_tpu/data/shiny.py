"""Shiny dataset (reference: datasets/shiny.py) — LLFF-layout scenes
(poses_bounds.npy + images/) captured with a denser rig; loading follows the
LLFF path with Shiny's default NDC usage and per-scene hold-outs."""

from hyperreel_tpu.data.llff import load_llff


def load_shiny(root_dir, split="train", downsample=4, use_ndc=True,
               val_skip=8, **kwargs):
    return load_llff(root_dir, split=split, downsample=downsample,
                     use_ndc=use_ndc, val_skip=val_skip, **kwargs)
