"""Golden parity for the joint-plane TensorVM and TensorCP factor
sampling against the REFERENCE torch classes (nlf/nets/tensorf_base.py
TensorVM:623-861, TensorCP:1235-1415).

The reference classes hardcode device='cuda' in TensorBase.__init__, so
they are instantiated via __new__ with only the attributes their
compute_densityfeature / compute_appfeature methods read; our params are
copied in (with the layout permutations our channel-last storage implies)
and both implementations are evaluated at identical normalized coords.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hyperreel_tpu.models.tensorf_extra import TensorVMJoint, TensorCP

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_tensorf_base():
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    from tests import reference_shim
    reference_shim.install()
    import types
    if "plyfile" not in sys.modules:  # only used by the PLY export path
        ply = types.ModuleType("plyfile")
        ply.PlyData = object
        ply.PlyElement = object
        sys.modules["plyfile"] = ply
    if "skimage" not in sys.modules:  # only used by marching cubes export
        sk = types.ModuleType("skimage")
        sk.measure = types.ModuleType("skimage.measure")
        sk.measure.marching_cubes = None
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = sk.measure
    path = os.path.join(REF, "nlf", "nets", "tensorf_base.py")
    spec = importlib.util.spec_from_file_location("ref_tensorf_base", path)
    mod = importlib.util.module_from_spec(spec)
    old = sys.path[:]
    sys.path.insert(0, REF)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path[:] = old
    return mod


BASE = {
    "white_bg": 0, "black_bg": 0, "fea2denseAct": "relu",
    "distance_scale": 16.0, "density_shift": 0.0,
    "aabb": [[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]],
    "N_voxel_init": 17 ** 3, "N_voxel_final": 17 ** 3,
    "upsamp_list": [], "update_AlphaMask_list": [],
    "shadingMode": "SH", "data_dim_color": 27,
    "densityMode": "Density",
}


def _coords(n=257, seed=3):
    rng = np.random.default_rng(seed)
    # include out-of-range coords to exercise clamping differences
    return rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)


class TestJointVMParity:
    def test_density_and_app_match_reference(self, ref_tensorf_base):
        nd, na = 4, 8
        ours = TensorVMJoint(cfg=dict(BASE, n_lamb_sigma=nd, n_lamb_sh=na))
        params = ours.init(jax.random.PRNGKey(0))
        R = ours.grid_size[0]
        C = nd + na

        ref = ref_tensorf_base.TensorVM.__new__(ref_tensorf_base.TensorVM)
        torch.nn.Module.__init__(ref)
        ref.matMode = [[0, 1], [0, 2], [1, 2]]
        ref.vecMode = [2, 1, 0]
        ref.density_n_comp = nd
        ref.app_n_comp = na
        ref.app_dim = 27
        # ours: plane [3, H, W, C] channel-last -> torch [3, C, H, W];
        # line [3, R, C] -> torch [3, C, R, 1]
        plane = np.asarray(params["plane_coef"], np.float32)
        line = np.asarray(params["line_coef"], np.float32)
        ref.plane_coef = torch.nn.Parameter(
            torch.from_numpy(plane).permute(0, 3, 1, 2).contiguous())
        ref.line_coef = torch.nn.Parameter(
            torch.from_numpy(line).permute(0, 2, 1)[..., None].contiguous())
        ref.basis_mat = torch.nn.Linear(na * 3, 27, bias=False)
        with torch.no_grad():
            ref.basis_mat.weight.copy_(torch.from_numpy(
                np.asarray(params["basis_mat"]["w"], np.float32).T))

        xyz = _coords()
        xyz_t = torch.from_numpy(xyz)

        sigma_ref = ref.compute_densityfeature(xyz_t).detach().numpy()
        app_ref = ref.compute_appfeature(xyz_t).detach().numpy()

        sigma_ours = np.asarray(ours._sample_density(params,
                                                     jnp.asarray(xyz)))
        app_ours = np.asarray(ours._sample_app(params, jnp.asarray(xyz)))

        assert sigma_ref.shape == sigma_ours.shape == (len(xyz),)
        np.testing.assert_allclose(sigma_ours, sigma_ref,
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(app_ours, app_ref, rtol=2e-4, atol=2e-5)


class TestCPParity:
    def test_density_and_app_match_reference(self, ref_tensorf_base):
        nd, na = 16, 24
        ours = TensorCP(cfg=dict(BASE, n_lamb_sigma=nd, n_lamb_sh=na))
        params = ours.init(jax.random.PRNGKey(1))

        ref = ref_tensorf_base.TensorCP.__new__(ref_tensorf_base.TensorCP)
        torch.nn.Module.__init__(ref)
        ref.vecMode = [2, 1, 0]
        ref.app_dim = 27
        # ours: line [R_i, C] per axis -> torch ParameterList of
        # [1, C, R_i, 1]
        to_t = lambda a: torch.nn.Parameter(  # noqa: E731
            torch.from_numpy(np.asarray(a, np.float32).T)[None, ..., None]
            .contiguous())
        ref.density_line = torch.nn.ParameterList(
            [to_t(p) for p in params["density_line"]])
        ref.app_line = torch.nn.ParameterList(
            [to_t(p) for p in params["app_line"]])
        ref.basis_mat = torch.nn.Linear(na, 27, bias=False)
        with torch.no_grad():
            ref.basis_mat.weight.copy_(torch.from_numpy(
                np.asarray(params["basis_mat"]["w"], np.float32).T))

        xyz = _coords(seed=7)
        xyz_t = torch.from_numpy(xyz)

        sigma_ref = ref.compute_densityfeature(xyz_t).detach().numpy()
        app_ref = ref.compute_appfeature(xyz_t).detach().numpy()

        sigma_ours = np.asarray(ours._sample_density(params,
                                                     jnp.asarray(xyz)))
        app_ours = np.asarray(ours._sample_app(params, jnp.asarray(xyz)))

        np.testing.assert_allclose(sigma_ours, sigma_ref,
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(app_ours, app_ref, rtol=2e-4, atol=2e-5)
