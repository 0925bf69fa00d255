"""Device trace of the coherent patch-gather eval chunk (round 4).

verify_patch_hw.py perf showed the patch path 10x SLOWER than quad
(0.89 vs 9.26 Mrays/s) despite the cost model predicting ~3.4x on the
gather floor — this traces the patch chunk and prints the top device
ops so the collapse can be attributed.

  python experiments/exp_patch_trace.py [patch|quad|both]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "experiments")
from exp_cf_model import log, rays_chunk, trace_path  # noqa: E402
import exp_cf_model  # noqa: E402


def build_patch(mode):
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters, with_coherent_gather)
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.models.ctx import StepCtx

    cfg = convert_epochs_to_iters(technicolor_z_plane(), 4000)
    cfg["color"]["net"]["fused_render"] = True
    if mode == "patch":
        cfg = with_coherent_gather(cfg)
    info = {"num_keyframes": 4, "num_frames": 50, "num_views": 16}
    model = build_model(cfg, dataset_info=info, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    assert model._cf_eval is not None
    if mode == "patch":
        assert model._cf_eval.patch_cfg is not None

    def fn(params, rays, it, rng):
        ctx = StepCtx(it=it, rng=rng, training=False)
        return model.apply(params, rays, ctx)["rgb"]

    return fn, params


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    log("devices:", jax.devices())
    it = jnp.asarray(0, jnp.int32)
    rng = jax.random.PRNGKey(1)
    rays = rays_chunk(1 << 18)
    # reuse exp_cf_model.trace_path by monkey-patching its builder
    for mode in (["patch", "quad"] if which == "both" else [which]):
        exp_cf_model.build = lambda m, _mode=mode: build_patch(_mode)
        trace_path(mode, rays, it, rng)


if __name__ == "__main__":
    main()
