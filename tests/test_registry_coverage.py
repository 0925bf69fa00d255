"""Registry-wide smoke coverage: every registered ray param, PE,
activation, intersect primitive, and regularizer constructs and runs on
well-formed inputs (mirrors the reference's registry surface, SURVEY.md §2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperreel_tpu.models.ray_param import ray_param_dict, get_ray_param
from hyperreel_tpu.models.pe import pe_dict, get_pe
from hyperreel_tpu.models.activations import activation_map, get_activation
from hyperreel_tpu.models.intersect import intersect_dict, build_intersect
from hyperreel_tpu.models.ctx import make_ctx


RAYS = jnp.asarray(np.concatenate([
    np.random.default_rng(0).uniform(-0.5, 0.5, (16, 3)),
    np.random.default_rng(1).uniform(-0.5, 0.5, (16, 3)) + [0, 0, 1.0],
    np.random.default_rng(2).uniform(0, 1, (16, 2)),
], -1).astype(np.float32))


PARAM_CFGS = {
    "identity": {"fn": "identity"},
    "take": {"fn": "take", "input_channels": [0, 2, 4]},
    "position": {"fn": "position"},
    "two_plane": {"fn": "two_plane"},
    "multi_plane": {"fn": "multi_plane", "z_channels": 4},
    "two_plane_matrix": {"fn": "two_plane_matrix"},
    "two_cylinder": {"fn": "two_cylinder"},
    "ray_plus_time": {"fn": "ray_plus_time",
                      "param": {"fn": "two_plane"}},
    "voxel_center": {"fn": "voxel_center", "voxel_size": 0.5},
    "z_slice": {"fn": "z_slice"},
    "contract_points": {"fn": "contract_points",
                        "param": {"fn": "identity", "n_dims": 6},
                        "contract": {"type": "mipnerf",
                                     "contract_end_radius": 8.0},
                        "contract_start_channel": 0,
                        "contract_end_channel": 3},
    "pluecker": {"fn": "pluecker"},
    "spherical": {"fn": "spherical", "radius": 2.0},
    "xy": {"fn": "xy"},
    "rays": {"fn": "rays"},
    "pluecker_pos": {"fn": "pluecker_pos"},
}


@pytest.mark.parametrize("name", sorted(ray_param_dict.keys()))
def test_every_ray_param_runs(name):
    cfg = PARAM_CFGS[name]
    p = get_ray_param(dict(cfg))
    out = p.apply(RAYS[:, :p.in_channels] if p.in_channels <= 8 else RAYS)
    assert out.shape[0] == 16
    assert bool(jnp.all(jnp.isfinite(out)))


PE_CFGS = {
    "basic": {"type": "basic", "n_freqs": 3},
    "windowed": {"type": "windowed", "n_freqs": 3, "wait_iters": 0,
                 "max_freq_iter": 100},
    "windowed_random": {"type": "windowed_random", "n_freqs": 4,
                        "max_freq_iter": 100},
    "learnable": {"type": "learnable", "n_freqs": 4},
    "identity": {"type": "identity"},
    "random": {"type": "random", "n_freqs": 4},
    "select": {"type": "select", "select_start": 0, "select_end": 2,
               "pe": {"type": "basic", "n_freqs": 2}},
}


@pytest.mark.parametrize("name", sorted(pe_dict.keys()))
def test_every_pe_runs(name):
    pe = get_pe(4, PE_CFGS[name])
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (8, 4)).astype(np.float32))
    out = pe.apply(x, make_ctx(50))
    assert out.shape == (8, pe.out_channels)
    assert bool(jnp.all(jnp.isfinite(out)))


ACT_SPECIAL = {
    "ease_value": {"type": "ease_value", "start_value": 1.0,
                   "window_iters": 10, "activation": "sigmoid"},
    "interp_value": {"type": "interp_value", "window_iters": 10,
                     "act1": "identity", "act2": "sigmoid"},
    "twist_to_matrix": {"type": "twist_to_matrix"},
    "axis_angle_translation": {"type": "axis_angle_translation"},
}


@pytest.mark.parametrize("name", sorted(activation_map.keys()))
def test_every_activation_runs(name):
    cfg = ACT_SPECIAL.get(name, name)
    act = get_activation(cfg)
    n_ch = 6 if name in ("twist_to_matrix", "axis_angle_translation",
                         "sparse_magnitude", "row_l1_norm",
                         "row_linf_norm", "row_l2_norm",
                         "row_l2_norm_z_only") else 4
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (8, n_ch)).astype(np.float32))
    out = act(x, make_ctx(5))
    assert bool(jnp.all(jnp.isfinite(out)))
    assert out.shape[0] == 8


INTERSECT_CFGS = {
    "z_plane": {"type": "z_plane", "sort": True, "initial": -1.0,
                "end": 1.0},
    "plane": {"type": "plane", "initial": -1.0, "end": 1.0},
    "sphere": {"type": "sphere", "initial": 0.5, "end": 2.0},
    "sphere_new": {"type": "sphere_new", "initial": 0.5, "end": 2.0},
    "cylinder": {"type": "cylinder", "initial": 0.5, "end": 2.0},
    "cylinder_new": {"type": "cylinder_new", "initial": 0.5, "end": 2.0},
    "voxel_grid": {"type": "voxel_grid", "initial": -1.0, "end": 1.0},
    "deformable_voxel_grid": {"type": "deformable_voxel_grid",
                              "initial": [-1, -1, -1], "end": [1, 1, 1]},
    "euclidean_distance": {"type": "euclidean_distance", "initial": 0.1,
                           "end": 2.0},
    "euclidean_distance_unified": {"type": "euclidean_distance_unified",
                                   "initial": 0.1, "end": 2.0},
    # 'z' is an alias for z_plane (shiny_z_tensorf.yaml's stale type
    # string — see models/intersect.py registry note)
    "z": {"type": "z", "sort": True, "initial": -1.0, "end": 1.0},
}


@pytest.mark.parametrize("name", sorted(intersect_dict.keys()))
def test_every_intersect_runs(name):
    cfg = INTERSECT_CFGS[name]
    z = 6  # number of samples (z_channels in the embedding config)
    stage = build_intersect(z, dict(cfg))
    rng = np.random.default_rng(5)
    B = 8
    if name in ("plane", "deformable_voxel_grid"):
        # 4 predicted channels per sample: (normal xyz, distance)
        z_vals = jnp.asarray(rng.standard_normal((B, z, 4))
                             .astype(np.float32))
    else:
        z_vals = jnp.asarray(rng.standard_normal((B, z, 1))
                             .astype(np.float32))
    x = {"z_vals": z_vals,
         "sigma": jnp.zeros((B, z_vals.shape[1], 1))}
    rays = RAYS[:B, :6]
    out = stage.apply({}, rays, x, make_ctx(100))
    assert "points" in out and "distances" in out
    assert bool(jnp.all(jnp.isfinite(out["points"])))


def test_stage_gating_blends_by_iteration():
    """wait_iters gating: before wait the stage's field changes are
    suppressed (reference embedding.py:106-110)."""
    from hyperreel_tpu.models.embeddings import build_embedding_chain
    cfg = {"embeddings": {
        "aff": {"type": "affine", "in_channels": 6, "out_channels": 6,
                "wait_iters": 100},
    }}
    chain = build_embedding_chain(cfg)
    params = chain.init(jax.random.PRNGKey(0))
    # nudge the affine weights away from identity so the stage has effect
    params["aff"]["w"] = params["aff"]["w"] + 0.5
    rays = RAYS[:, :6]
    before = chain.apply(params, rays, make_ctx(10))["rays"]
    after = chain.apply(params, rays, make_ctx(200))["rays"]
    np.testing.assert_allclose(np.asarray(before), np.asarray(rays),
                               atol=1e-6)
    assert not np.allclose(np.asarray(after), np.asarray(rays))


def test_every_model_preset_builds():
    """Every MODEL_PRESETS entry must compose into a buildable model (a
    registry typo or a preset/config drift would otherwise only surface
    at CLI runtime)."""
    import jax
    from hyperreel_tpu.config import MODEL_PRESETS
    from hyperreel_tpu.configs.presets import convert_epochs_to_iters
    from hyperreel_tpu.models.model import build_model

    info = {"num_keyframes": 3, "num_frames": 12, "num_views": 4,
            "near": 0.5, "far": 3.5, "depth_range": (0.5, 3.5)}
    for name, fn in MODEL_PRESETS.items():
        cfg = convert_epochs_to_iters(fn(), iters_per_epoch=100)
        model = build_model(cfg, dataset_info=info)
        params = model.init(jax.random.PRNGKey(0))
        assert params, name
