"""Blender synthetic dataset (reference: datasets/blender.py).

transforms_{split}.json with camera_angle_x + frames[].transform_matrix;
RGBA images composited onto white (reference datasets/blender.py:54-72).
Ray layout [o, d, cam_idx] = 7 channels.
"""

import json
import os

import numpy as np
from PIL import Image

from hyperreel_tpu.data.base import RayDataset
from hyperreel_tpu.ops.ray_math import get_ray_directions_K, get_rays


def load_blender(root_dir, split="train", img_wh=(800, 800), white_bg=True):
    meta_split = {"train": "train", "val": "val", "test": "test",
                  "render": "test"}[split]
    with open(os.path.join(root_dir,
                           f"transforms_{meta_split}.json")) as f:
        meta = json.load(f)

    W, H = img_wh
    focal = 0.5 * 800 / np.tan(0.5 * meta["camera_angle_x"])
    focal *= W / 800.0
    K = [[focal, 0, W / 2.0], [0, focal, H / 2.0], [0, 0, 1]]
    directions = get_ray_directions_K(H, W, K, centered_pixels=True)

    coords_list, rgb_list = [], []
    for idx, frame in enumerate(meta["frames"]):
        c2w = np.array(frame["transform_matrix"])[:3, :4]
        rays_o, rays_d = get_rays(directions, c2w)
        cam_idx = np.full((rays_o.shape[0], 1), idx, np.float32)
        coords_list.append(np.concatenate(
            [rays_o, rays_d, cam_idx], -1).astype(np.float32))

        img_path = os.path.join(root_dir, frame["file_path"] + ".png")
        img = Image.open(img_path)
        img = img.resize(img_wh, Image.LANCZOS)
        img = np.asarray(img, np.float32) / 255.0
        if img.shape[-1] == 4:
            rgb = img[..., :3] * img[..., 3:] + (
                (1.0 - img[..., 3:]) if white_bg else 0.0)
        else:
            rgb = img[..., :3]
        rgb_list.append(rgb.reshape(-1, 3))

    return RayDataset(
        all_coords=np.concatenate(coords_list, 0),
        all_rgb=np.concatenate(rgb_list, 0),
        img_wh=img_wh,
        num_images=len(meta["frames"]),
        num_views=len(meta["frames"]),
        near=2.0,
        far=6.0,
        depth_range=(2.0, 6.0),
    )
