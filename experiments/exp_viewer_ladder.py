"""Round-4 viewer FPS ladder (VERDICT r3 item 6, real TPU).

Measures end-to-end Viewer.render_frame latency (ray gen + device
render + readback + frame assemble — the honest interactive loop) at
512^2 and megapixel (1024^2), for the current fast stack:
  - exact quad path
  - coherent patch path (auto via the analytic coverage gate)
  - patch + compact k=16 (the production fast point)
against the reference's 200 ms viewer budget
(reference utils/gui_utils.py:139-213; 18 FPS @ 1MP claim README.md:3).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def build(mode):
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters,
        with_coherent_gather, with_compact_samples)
    from hyperreel_tpu.models.model import build_model

    cfg = convert_epochs_to_iters(technicolor_z_plane(), 4000)
    cfg["color"]["net"]["fused_render"] = True
    if "c16" in mode:
        cfg = with_compact_samples(cfg, 16)
    base = build_model(cfg, dataset_info={
        "num_keyframes": 4, "num_frames": 50, "num_views": 16},
        compute_dtype=jnp.bfloat16)
    patch = None
    if "patch" in mode:
        pcfg = with_coherent_gather(cfg, 3, 2)  # the shipped default
        patch = build_model(pcfg, dataset_info={
            "num_keyframes": 4, "num_frames": 50, "num_views": 16},
            compute_dtype=jnp.bfloat16)
    return base, patch


def main():
    from hyperreel_tpu.viewer import InteractiveRenderer
    log("devices:", jax.devices())
    pose = np.eye(4, dtype=np.float32)[:3]
    pose[2, 3] = 2.0

    for mode in ("quad", "patch", "patch+c16"):
        base, patch = build(mode)
        params = base.init(jax.random.PRNGKey(0))
        for side in (512, 1024):
            v = InteractiveRenderer(model=base, params=params, base_wh=(side, side),
                       ladder=(1.0,), patch_model=patch)
            # warm (compile), then 5 timed frames with distinct poses.
            # Time the WHOLE call (device render + uint8 frame readback):
            # the internal dt stops at block_until_ready, which resolves
            # early through the axon tunnel (CLAUDE.md timing rule) —
            # the np.asarray readback is the trustworthy sync point.
            v.render_frame(pose)
            times = []
            for i in range(5):
                p2 = pose.copy()
                p2[0, 3] += 1e-4 * (i + 1)
                t0 = time.perf_counter()
                frame, _ = v.render_frame(p2)
                assert frame.sum() >= 0  # force materialization
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            log(f"[{mode}] {side}x{side}: {dt*1e3:7.1f} ms/frame "
                f"({1.0/dt:5.2f} FPS, {side*side/dt/1e6:5.2f} Mrays/s) "
                f"patch_gate={'on' if v.last_used_patch else 'off'}")

            # depth-2 PIPELINED throughput (submit pose N+1 before
            # reading frame N): recovers the unpipelined tunnel RTT;
            # 8 frames, distinct poses, clock stops on the last frame's
            # readback (in-order execution covers the rest)
            h = v.submit_frame(pose)
            t0 = time.perf_counter()
            nf = 8
            for i in range(nf):
                p2 = pose.copy()
                p2[0, 3] += 1e-4 * (i + 1)
                h2 = v.submit_frame(p2)
                frame, _ = v.read_frame(h)
                h = h2
            frame, _ = v.read_frame(h)
            assert frame.sum() >= 0
            dtp = (time.perf_counter() - t0) / (nf + 1)
            log(f"[{mode}] {side}x{side} PIPELINED: {dtp*1e3:7.1f} "
                f"ms/frame ({1.0/dtp:5.2f} FPS, "
                f"{side*side/dtp/1e6:5.2f} Mrays/s)")


if __name__ == "__main__":
    sys.exit(main())
