"""FULL-pipeline golden parity against the reference (VERDICT r2 item 4).

Instantiates the reference's actual `LightfieldModel`
(/root/reference/nlf/models/models.py:104-143) from its own shipped yaml
(via configs/reference_yaml.py), runs rays through torch, saves a
lightning-style .ckpt, imports it with tools/import_reference_ckpt.py,
and asserts ray-for-ray rgb parity against this framework's model built
from the SAME yaml — one static (tensor_vm_split_no_sample) and one
dynamic (tensor_vm_split_time) config.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import reference_shim

from hyperreel_tpu.config import deep_update
from hyperreel_tpu.configs import reference_yaml
from hyperreel_tpu.configs.presets import convert_epochs_to_iters
from hyperreel_tpu.models.ctx import make_ctx
from hyperreel_tpu.models.model import build_model
from hyperreel_tpu.tools.import_reference_ckpt import (
    import_reference_state_dict)

pytestmark = pytest.mark.skipif(
    not reference_yaml.reference_conf_available(),
    reason="reference repo not present")

GRID = 24
IT = 50000  # all ease/window schedules fully settled


class _FakeDataset:
    total_num_views = 4
    num_frames = 8
    num_keyframes = 4
    num_images = 4
    # dataset bounds (reference intersects with use_dataset_bounds read
    # these off the live datamodule: nlf/intersect/base.py:88,
    # primitive.py:134/186/261/371/446, voxel.py:27-29, z.py:26, and
    # MIPNeRFContract nlf/contract.py:120-125)
    near = 0.5
    far = 6.0
    depth_range = (1.0, 8.0)
    bbox_min = np.array([-1.5, -1.25, -1.75], np.float32)
    bbox_max = np.array([1.25, 1.75, 1.5], np.float32)


class _FakeDM:
    train_dataset = _FakeDataset()
    val_dataset = _FakeDataset()


class _FakeSystem:
    dm = _FakeDM()

    def __init__(self):
        self.cfg = reference_shim.Cfg(
            {"dataset": {"collection": "synthetic", "name": "synthetic"}})


def _shrink(cfg):
    net = cfg["color"]["net"]
    net["N_voxel_init"] = GRID ** 3
    net["N_voxel_final"] = GRID ** 3
    net["upsamp_list"] = []
    net["update_AlphaMask_list"] = []
    emb = cfg["embedding"]["embeddings"]
    emb["ray_prediction_0"]["net"].update(
        {"depth": 4, "hidden_channels": 32, "skips": [2]})
    emb["ray_prediction_0"]["z_channels"] = 8
    for st in emb.values():
        if "z_channels" in st:
            st["z_channels"] = 8
    return cfg


def _rays(n, dynamic, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    o[:, 2] = -1.2
    d = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    cam = rng.randint(0, 4, (n, 1)).astype(np.float32)
    t = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    if dynamic:
        return np.concatenate([o, d, cam, t], -1)
    return np.concatenate([o, d], -1)


def _coherent_rays(n, dynamic):
    """Scanline pinhole rays (adjacent-pixel 4-blocks at megapixel-class
    density): the patch-gather exactness contract holds only when a
    4-ray block's bilinear footprint fits the patch, so the fused-route
    golden pins use frame-render rays — the geometry the patch route
    ships for — while the general-path pins keep the adversarial
    random rays."""
    side = 4096
    fov_px = side * 1.2
    u = (np.arange(n, dtype=np.float32) - n / 2) / fov_px
    v = np.full(n, 17.0 / fov_px, np.float32)
    d = np.stack([u, v, np.ones_like(u)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros_like(d)
    o[:, 2] = -1.2
    if dynamic:
        cam = np.full((n, 1), 1.0, np.float32)
        t = np.full((n, 1), 0.35, np.float32)
        return np.concatenate([o, d, cam, t], -1)
    return np.concatenate([o, d], -1)


def _run_reference(cfg_dict, rays_np, tmp_path):
    """Build + run the reference model; return (rgb, ckpt_path)."""
    reference_shim.install()
    import torch
    from nlf.models.models import model_dict as ref_model_dict

    torch.manual_seed(0)
    ref_cfg = reference_shim.Cfg(cfg_dict)
    model = ref_model_dict["lightfield"](ref_cfg, system=_FakeSystem())
    model.eval()
    model.set_iter(IT)
    with torch.no_grad():
        out = model(torch.from_numpy(rays_np), {})
    rgb = out["rgb"].numpy()

    # lightning-style checkpoint (reference nlf/__init__.py:433-479 save
    # format: everything nested under deep module prefixes)
    sd = {"render_fn.model." + k: v for k, v in model.state_dict().items()}
    ckpt_path = os.path.join(tmp_path, "ref.ckpt")
    torch.save({"state_dict": sd, "epoch": 1}, ckpt_path)
    return rgb, ckpt_path


def _run_ours(cfg_dict, rays_np, ckpt_path, route="general"):
    """route: "general" (XLA reference path), "fused" (CF pipeline +
    Pallas blend/shade kernels, interpret mode on CPU), or "patch"
    (fused + coherent patch-gather (3,2)) — the round-5 fused-route
    golden pins (VERDICT item 8): the FAST paths are checked against
    the reference's torch numbers directly, not just against the
    general path."""
    import torch
    cfg = convert_epochs_to_iters(cfg_dict, iters_per_epoch=1000)
    cfg = deep_update(cfg, {"color": {"net": {
        "bf16_tables": False,
        "fused_render": route in ("fused", "patch")}}})
    if route == "patch":
        from hyperreel_tpu.configs.presets import with_coherent_gather
        cfg = with_coherent_gather(cfg, 3, 2)
    # bounds mirror _FakeDataset so use_dataset_bounds configs see the
    # same numbers on both sides
    info = {"num_keyframes": 4, "num_frames": 8, "num_views": 4,
            "near": _FakeDataset.near, "far": _FakeDataset.far,
            "depth_range": _FakeDataset.depth_range,
            "bbox": (_FakeDataset.bbox_min, _FakeDataset.bbox_max)}
    model = build_model(cfg, dataset_info=info)
    params = model.init(jax.random.PRNGKey(0))
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    params, report = import_reference_state_dict(ckpt["state_dict"], params)
    # every reference tensor must land somewhere (full-pipeline claim) —
    # except weights the reference registers but never evaluates:
    # basis_mat_density exists under densityMode=Density yet only
    # DensityLinear/Fourier read it (reference tensorf_dynamic.py:373-392)
    real_skips = [s for s in report["skipped"]
                  if not s[0].endswith("basis_mat_density.weight")]
    assert not real_skips, real_skips
    ctx = make_ctx(it=IT, training=False)
    out = model.apply(params, jnp.asarray(rays_np), ctx)
    return np.asarray(out["rgb"]), report


def _parity(name, dynamic, tmp_path, routes=("general",), n_rays=64):
    cfg = _shrink(reference_yaml.reference_model_cfg(name))
    rays = (_coherent_rays(n_rays, dynamic) if "patch" in routes
            else _rays(n_rays, dynamic))
    ref_rgb, ckpt = _run_reference(
        convert_epochs_to_iters(cfg, iters_per_epoch=1000), rays,
        str(tmp_path))
    for route in routes:
        our_rgb, report = _run_ours(cfg, rays, ckpt, route=route)
        assert len(report["mapped"]) > 10
        err = np.abs(ref_rgb - our_rgb).max()
        assert err < 1e-4, (name, route, err, ref_rgb[:3], our_rgb[:3])


def _shrink_generic(cfg):
    """Shrink nets/grids for CPU speed; keep z_channels and every stage
    composition exactly as shipped (the integration surface under test)."""
    net = cfg["color"]["net"]
    net["N_voxel_init"] = GRID ** 3
    net["N_voxel_final"] = GRID ** 3
    if "grid_size" in net:  # grid_size.start wins over N_voxel_init
        net["grid_size"] = {"start": [GRID] * 3, "end": [GRID] * 3}
    net["upsamp_list"] = []
    net["update_AlphaMask_list"] = []
    if "time_grid_init" in net:
        net["time_grid_init"] = 4
        net["time_grid_final"] = 4
    for st in cfg["embedding"]["embeddings"].values():
        if isinstance(st, dict) and isinstance(st.get("net"), dict):
            st["net"].update(
                {"depth": 4, "hidden_channels": 32, "skips": [2]})
    return cfg


def _parity_generic(name, dynamic, tmp_path):
    cfg = _shrink_generic(reference_yaml.reference_model_cfg(name))
    rays = _rays(64, dynamic)
    ref_rgb, ckpt = _run_reference(
        convert_epochs_to_iters(cfg, iters_per_epoch=1000), rays,
        str(tmp_path))
    our_rgb, report = _run_ours(cfg, rays, ckpt)
    assert len(report["mapped"]) > 10
    err = np.abs(ref_rgb - our_rgb).max()
    assert err < 1e-4, (name, err, ref_rgb[:3], our_rgb[:3])


class TestFullPipelineParity:
    def test_static_no_sample(self, tmp_path):
        _parity("llff_z_plane_small", dynamic=False, tmp_path=tmp_path)

    def test_dynamic_keyframe_time(self, tmp_path):
        _parity("technicolor_z_plane_small", dynamic=True,
                tmp_path=tmp_path)

    # round-5 fused-route golden pins (VERDICT item 8): the SAME
    # reference checkpoint evaluated through the Pallas fused and
    # fused+patch routes at the SAME <1e-4 — the fast paths are pinned
    # to the reference's numbers directly. Static multi-axis covers
    # the _shade_kernel_multi family; dynamic covers the flagship
    # dyn1 kernel (time two-hot) and the patch-blend contract.
    def test_static_no_sample_fused_routes(self, tmp_path):
        _parity("llff_z_plane_small", dynamic=False, tmp_path=tmp_path,
                routes=("fused", "patch"), n_rays=256)

    def test_dynamic_keyframe_time_fused_routes(self, tmp_path):
        _parity("technicolor_z_plane_small", dynamic=True,
                tmp_path=tmp_path, routes=("fused", "patch"),
                n_rays=256)


# Every intersect-family x embedding-stage composition the reference
# ships (VERDICT r3 item 5): sphere multi-ch z blocks
# (primitive.py:366-462), sphere_new (primitive.py:464-545), cylinder
# (primitive.py:181-260), voxel_grid (voxel.py), unified euclidean
# distance + point_offset (primitive.py:101-179), and the cascaded
# two-stage point_prediction chain (point.py:39-218).
class TestFullPipelineParityFamilies:
    def test_sphere(self, tmp_path):
        _parity_generic("donerf_sphere", dynamic=False, tmp_path=tmp_path)

    def test_sphere_new_dynamic(self, tmp_path):
        _parity_generic("immersive_sphere_new", dynamic=True,
                        tmp_path=tmp_path)

    def test_cylinder(self, tmp_path):
        _parity_generic("donerf_cylinder", dynamic=False,
                        tmp_path=tmp_path)

    def test_voxel_grid(self, tmp_path):
        _parity_generic("donerf_voxel", dynamic=False, tmp_path=tmp_path)

    def test_euclidean_distance_unified(self, tmp_path):
        _parity_generic("catacaustics_distance", dynamic=False,
                        tmp_path=tmp_path)

    def test_cascaded_point_prediction(self, tmp_path):
        _parity_generic("technicolor_cascaded", dynamic=True,
                        tmp_path=tmp_path)
