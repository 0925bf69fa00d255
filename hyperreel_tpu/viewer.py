"""Interactive viewer (reference: utils/gui_utils.py NeRFGUI/OrbitCamera).

dearpygui is not TPU-idiomatic; the contract is "render full frames at
interactive rates given a pose/time stream" (gui_utils.py:139-213). This
module provides:

  * OrbitCamera — the same orbit/pan/zoom camera model;
  * InteractiveRenderer — persistent per-resolution compiled render fns
    (a dynamic-resolution *ladder*, replacing the reference's continuous
    downscale at gui_utils.py:186-193) with a frame-time budget;
  * serve() — a minimal HTTP MJPEG/PNG server so any browser can act as
    the display (zero-dependency stand-in for the dearpygui window).
"""

import io
import time
from dataclasses import dataclass, field

import numpy as np

from hyperreel_tpu.models.ctx import make_ctx
from hyperreel_tpu.ops.ray_math import get_ray_directions_K, get_rays


class OrbitCamera:
    """Orbit camera (reference utils/gui_utils.py:17-72)."""

    def __init__(self, W, H, r=2.0, fovy=60.0):
        self.W, self.H = W, H
        self.radius = r
        self.fovy = fovy
        self.center = np.zeros(3, np.float32)
        self.rot = np.eye(3, dtype=np.float32)

    @property
    def pose(self):
        """Camera-to-world (reference utils/gui_utils.py:29-50: camera at
        -radius on z, rotated, then the y/z column flip into the -z-forward
        ray convention)."""
        res = np.eye(4, dtype=np.float32)
        res[2, 3] -= self.radius
        rot = np.eye(4, dtype=np.float32)
        rot[:3, :3] = self.rot
        res = rot @ res
        res[:3, 3] -= self.center
        res[..., 1] *= -1
        res[..., 2] *= -1
        return res[:3]

    @property
    def intrinsics(self):
        focal = self.H / (2.0 * np.tan(np.radians(self.fovy) / 2.0))
        return np.array([[focal, 0, self.W / 2],
                         [0, focal, self.H / 2],
                         [0, 0, 1]], np.float32)

    def orbit(self, dx, dy):
        def rotmat(axis, angle):
            c, s = np.cos(angle), np.sin(angle)
            x, y, z = axis
            K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], np.float32)
            return np.eye(3, dtype=np.float32) + s * K + (1 - c) * (K @ K)

        side = self.rot[:3, 0]
        up = np.array([0, 1, 0], np.float32)
        self.rot = rotmat(up, -0.005 * dx) @ rotmat(side, -0.005 * dy) @ self.rot

    def scale(self, delta):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx, dy, dz=0):
        self.center += 0.0005 * self.rot[:3, :3] @ np.array(
            [dx, dy, dz], np.float32)


@dataclass
class InteractiveRenderer:
    """Frame renderer with a compiled-resolution ladder and a frame budget
    (reference gui_utils.py:139-213: 200 ms target, downscale in [1/4, 1])."""

    model: object
    params: object
    base_wh: tuple = (512, 512)
    frame_budget_s: float = 0.2
    ladder: tuple = (1.0, 0.7071, 0.5, 0.3536, 0.25)
    ray_width: int = 8
    it: int = 10 ** 6
    # optional coherent patch-gather clone of `model`
    # (with_coherent_gather): used per frame only when the analytic
    # coverage bound for the CURRENT ladder level holds (high pixel
    # density), so low ladder levels keep the exact quad path
    patch_model: object = None

    # rays per compiled chunk: frames above this render as lax.map over
    # chunks (the bench/serving shape; also the v5e HBM ceiling for the
    # quad unpack temporaries — PERFORMANCE.md)
    chunk: int = 1 << 18

    def __post_init__(self):
        import jax
        self._level = len(self.ladder) - 1  # start conservative
        self._jax = jax
        self._frame_fns = {}
        # Device-resident weights: jit does NOT cache host (numpy) args,
        # so leaving params on host re-uploads the full parameter set
        # through the axon tunnel EVERY frame (measured: seconds/frame,
        # round-4 viewer ladder). One device_put here removes that.
        self.params = jax.device_put(self.params)
        # per-checkpoint serving prep: prebuilt fused-eval tables (ships
        # into every compiled frame as jit args, so frames skip the
        # table rebuild; None falls back to in-trace building)
        prep = getattr(self.model, "prepare_eval", lambda p: None)(
            self.params)
        if prep is not None:
            prep = jax.device_put(prep)

        def fwd(params, prepared, rays):
            ctx = make_ctx(it=self.it, training=False)

            def one(r):
                rk = {"cf_prepared": prepared} if prepared is not None \
                    else None
                return self.model.apply(params, r, ctx,
                                        render_kwargs=rk)["rgb"]
            return self._jax.lax.map(one, rays)

        self._prepared = prep
        self._fwd = jax.jit(fwd)

        self._patch_fwd = None
        self._patch_gate_cache = {}
        self.last_used_patch = False
        if self.patch_model is not None and \
                getattr(self.patch_model, "_cf_eval", None) is not None:
            self._patch_prepared = jax.device_put(
                self.patch_model.prepare_eval(self.params))

            def patch_fwd(params, prepared, rays):
                # rays arrive phase-major per chunk (host-side reindex at
                # ray gen — the serving contract, fused_eval.py
                # rays_phase_major); outputs are un-permuted host-side.
                ctx = make_ctx(it=self.it, training=False)

                def one(r):
                    rk = {"cf_prepared": prepared,
                          "rays_phase_major": True} \
                        if prepared is not None \
                        else {"rays_phase_major": True}
                    return self.patch_model.apply(
                        params, r, ctx, render_kwargs=rk)["rgb"]
                return self._jax.lax.map(one, rays)

            self._patch_fwd = jax.jit(patch_fwd)
            cf = self.patch_model._cf_eval
            meta = cf._plan_meta(self.params["color"])
            self._patch_res = max(
                max(w, h) for (w, h, _, _) in meta["axis_specs"])
            aabb = np.asarray(cf.net.aabb, np.float32)
            self._patch_extent = float((aabb[1] - aabb[0]).min())
            self._patch_diag = float(
                np.linalg.norm(aabb[1] - aabb[0]))
            self._patch_px = cf.patch_cfg[0]
            # coherent block size (rays per gathered patch row): the
            # pm constants and un-permutes below must match it
            self._patch_R = cf.patch_block

    def _patch_bound(self, focal_px, pose):
        """Analytic coverage bound: worst-case x-texel spread of a
        4-consecutive-pixel block is 3 * t_max / focal_px world-per-px
        * texels-per-world; patch is exact when that (+1 bilinear
        corner, +1 jitter margin) fits the px budget. Conservative
        (t_max uses the full aabb diagonal), so a pass is trustworthy;
        a fail falls through to the empirical probe."""
        t_max = float(np.linalg.norm(np.asarray(pose)[:3, 3])) \
            + self._patch_diag
        spread = (self._patch_R - 1.0) * t_max / float(focal_px) \
            * (self._patch_res - 1) / self._patch_extent
        return spread <= self._patch_px - 3

    def _patch_probe_ok(self, rays, W, H, focal_px, pose):
        """Empirical gate when the analytic bound fails: render the
        worst-case block rows (top / middle / bottom of the frame, where
        ray angles are extreme) through BOTH paths and compare. Patch
        exactness is per 4-ray block (each block's footprint is
        independent), so block-row parity transfers to the frame. Cached
        per (W, H, radius bucket) — the spread scales with camera
        distance, so re-probe on big zoom changes."""
        import jax.numpy as jnp
        r = float(np.linalg.norm(np.asarray(pose)[:3, 3]))
        key = (W, H, int(np.round(np.log1p(r) * 4)))
        hit = self._patch_gate_cache.get(key)
        if hit is not None:
            return hit
        rows = sorted({0, H // 2, H - 1})
        probe = np.concatenate([rays[y * W:(y + 1) * W] for y in rows], 0)
        pad = (-len(probe)) % 1024
        if pad:
            probe = np.concatenate(
                [probe, np.repeat(probe[-1:], pad, 0)], 0)
        n = len(probe)
        quad = np.asarray(self._fwd(
            self.params, self._prepared,
            jnp.asarray(probe[None])))[0]
        Rb = self._patch_R
        pm = probe.reshape(n // Rb, Rb, -1).transpose(
            1, 0, 2).reshape(n, -1)
        patch = np.asarray(self._patch_fwd(
            self.params, self._patch_prepared, jnp.asarray(pm[None])))[0]
        patch = patch.reshape(Rb, n // Rb, -1).transpose(
            1, 0, 2).reshape(n, -1)
        ok = bool(np.abs(patch - quad).max() < 1e-3)
        self._patch_gate_cache[key] = ok
        return ok

    def _patch_ok(self, focal_px, pose, rays=None, W=None, H=None):
        if self._patch_fwd is None:
            return False
        if self._patch_bound(focal_px, pose):
            return True
        if rays is None:
            return False
        if callable(rays):
            r = float(np.linalg.norm(np.asarray(pose)[:3, 3]))
            key = (W, H, int(np.round(np.log1p(r) * 4)))
            if key in self._patch_gate_cache:   # avoid building host
                return self._patch_gate_cache[key]  # rays on cache hit
            rays = rays()
        return self._patch_probe_ok(rays, W, H, focal_px, pose)

    def _frame_fn(self, W, H, use_patch, ray_width):
        """Compiled pose->frame path: rays are generated IN-GRAPH from a
        [3,3] K + [3,4] pose (the per-frame host->device upload drops
        from 32 MB of rays to ~60 B), and the output is uint8 in-graph
        (3 MB readback, not 12 MB f32). The pixel-grid constants are
        PRE-PERMUTED host-side into the phase-major chunk order when the
        patch path is on, so the pm contract costs nothing in-graph."""
        import jax
        import jax.numpy as jnp
        key = (W, H, use_patch, ray_width)
        hit = self._frame_fns.get(key)
        if hit is not None:
            return hit
        n = W * H
        cs = self.chunk if n >= self.chunk else (n + 1023) // 1024 * 1024
        pad = (-n) % cs
        k = (n + pad) // cs
        # flat pixel coords, padded by replicating the last pixel
        jj, ii = np.meshgrid(np.arange(H, dtype=np.float32),
                             np.arange(W, dtype=np.float32),
                             indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        if pad:
            ii = np.concatenate([ii, np.repeat(ii[-1:], pad)])
            jj = np.concatenate([jj, np.repeat(jj[-1:], pad)])
        if use_patch:
            # phase-major per chunk as a CONSTANT reindex of the grid
            Rb = self._patch_R
            pm = (np.arange(k * cs).reshape(k, cs // Rb, Rb)
                  .transpose(0, 2, 1).reshape(-1))
            ii, jj = ii[pm], jj[pm]
        ii = jnp.asarray(ii.reshape(k, cs))
        jj = jnp.asarray(jj.reshape(k, cs))
        model = self.patch_model if use_patch else self.model
        base_rk = {"rays_phase_major": True} if use_patch else {}
        if ray_width == 8:
            # a viewer frame shares ONE t (scalar broadcast below), so
            # the uniform-time premix always applies: the keyframe time
            # mix hoists out of the shade kernel ((TH+2)x fewer MXU
            # FLOPs — fused_eval uniform_time, round 5). The witness is
            # structurally 0 here; non-CF models ignore the kwarg.
            base_rk["uniform_time"] = True

        def fn(params, prepared, cam_pack):
            # ONE [23] f32 upload per frame (K 9 + pose 12 + t + cam):
            # four separate tiny jnp.asarray uploads each paid a tunnel
            # round trip, dominating the pipelined frame time
            # (viewer_ladder5: pipelining recovered only ~30 ms of the
            # ~150 ms/frame host share). Split in-graph — free.
            K = cam_pack[:9].reshape(3, 3)
            pose = cam_pack[9:21].reshape(3, 4)
            t = cam_pack[21]
            cam = cam_pack[22]
            ctx = make_ctx(it=self.it, training=False)
            # get_ray_directions_K semantics (ops/ray_math.py:8-26,
            # centered_pixels) + get_rays rotation/normalize (29-39)
            x = (ii - K[0, 2] + 0.5) / K[0, 0]
            y = -(jj - K[1, 2] + 0.5) / K[1, 1]
            dirs = jnp.stack([x, y, -jnp.ones_like(x)], -1)
            d = dirs @ pose[:, :3].T
            d = d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
            o = jnp.broadcast_to(pose[:, 3], d.shape)
            cols = [o, d]
            if ray_width >= 7:
                cols.append(jnp.full(d.shape[:-1] + (1,), cam))
            if ray_width == 8:
                cols.append(jnp.full(d.shape[:-1] + (1,), t))
            rays = jnp.concatenate(cols, -1)

            def one(r):
                rk = dict(base_rk)
                if prepared is not None:
                    rk["cf_prepared"] = prepared
                return model.apply(params, r, ctx,
                                   render_kwargs=rk or None)["rgb"]
            rgb = self._jax.lax.map(one, rays)
            return (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        jf = self._jax.jit(fn)
        self._frame_fns[key] = (jf, k, cs, pad)
        return self._frame_fns[key]

    def _wh_for(self, level):
        s = self.ladder[level]
        W = max(int(self.base_wh[0] * s) // 8 * 8, 32)
        H = max(int(self.base_wh[1] * s) // 8 * 8, 32)
        return W, H

    def precompile(self):
        """Compile every ladder level up front so level switches don't
        hitch mid-session (each first-visit compile costs seconds)."""
        import numpy as np
        pose = np.eye(4, dtype=np.float32)[:3]
        pose[2, 3] = 2.0
        level = self._level
        for l in range(len(self.ladder)):
            self._level = l
            self.render_frame(pose)
        self._level = level

    def _host_rays(self, W, H, K, pose, t, cam_id):
        """Host-side ray build (the patch-gate probe path only; frames
        go through the compiled pose path, _frame_fn)."""
        dirs = get_ray_directions_K(H, W, K, centered_pixels=True)
        rays_o, rays_d = get_rays(dirs, np.asarray(pose, np.float32))
        rays = np.concatenate([rays_o, rays_d], -1).astype(np.float32)
        if self.ray_width >= 7:
            rays = np.concatenate(
                [rays, np.full((rays.shape[0], 1), cam_id, np.float32)],
                -1)
        if self.ray_width == 8:
            rays = np.concatenate(
                [rays, np.full((rays.shape[0], 1), t, np.float32)], -1)
        return rays

    def submit_frame(self, pose, K=None, t=0.0, cam_id=1.0):
        """ASYNC dispatch of one frame: returns an opaque handle for
        read_frame. Submitting pose N+1 before reading frame N
        pipelines device execution against the host/tunnel round trip
        — the viewer ladder measured ~150 ms/frame of UNPIPELINED
        tunnel RTT at 1MP (viewer_ladder4); with depth-2 pipelining
        throughput approaches the device rate while interaction
        latency stays one frame (the reference GUI renders strictly
        synchronously, utils/gui_utils.py:139-213 — on a
        locally-attached chip both designs converge)."""
        import jax.numpy as jnp
        W, H = self._wh_for(self._level)
        if K is None:
            focal = H / (2.0 * np.tan(np.radians(60.0) / 2.0))
            K = [[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]]
        else:
            K = np.asarray(K, np.float32).copy()
            K[0] *= W / self.base_wh[0]
            K[1] *= H / self.base_wh[1]
        K = np.asarray(K, np.float32)
        n = W * H

        use_patch = self._patch_ok(
            float(K[0, 0]), pose, W=W, H=H,
            rays=lambda: self._host_rays(W, H, K, pose, t, cam_id))
        self.last_used_patch = use_patch
        jf, k, cs, pad = self._frame_fn(W, H, use_patch, self.ray_width)

        t0 = time.perf_counter()
        cam_pack = np.concatenate([
            K.reshape(-1).astype(np.float32),
            np.asarray(pose, np.float32).reshape(-1),
            np.asarray([t, cam_id], np.float32)])
        dev_out = jf(
            self.params, self._patch_prepared if use_patch
            else self._prepared, jnp.asarray(cam_pack))
        return (dev_out, W, H, n, use_patch, k, cs, t0)

    def read_frame(self, handle):
        """Materialize a submit_frame handle -> (HxWx3 u8 frame, dt).
        dt covers submit->readback of THIS frame (for a pipelined
        caller that's ~the pipeline stage time, not latency)."""
        dev_out, W, H, n, use_patch, k, cs, t0 = handle
        out_u8 = np.asarray(dev_out)
        if use_patch:
            Rb = self._patch_R
            out_u8 = out_u8.reshape(k, Rb, cs // Rb, 3).transpose(
                0, 2, 1, 3).reshape(-1, 3)
        else:
            out_u8 = out_u8.reshape(-1, 3)
        # the np.asarray readback above is the trustworthy sync point
        # through the axon tunnel (block_until_ready resolves early)
        dt = time.perf_counter() - t0

        # ladder adaptation (discrete version of gui_utils.py:186-193)
        if dt > self.frame_budget_s and self._level < len(self.ladder) - 1:
            self._level += 1
        elif dt < self.frame_budget_s * 0.4 and self._level > 0:
            self._level -= 1

        return out_u8[:n].reshape(H, W, 3), dt

    def render_frame(self, pose, K=None, t=0.0, cam_id=1.0):
        """Render one frame synchronously (submit + read); adapts the
        ladder level to the measured frame time."""
        return self.read_frame(self.submit_frame(pose, K, t, cam_id))


def fast_mode_probe(model, params, fast_model, fast_params, coords,
                    it, n_rays=8192, gate_db=35.0):
    """Scene-dependent quality gate for the viewer's auto fast mode.

    Renders a dataset-wide ray slice with the full model and the
    compact/stride fast model and compares them: `gate_db` between the
    two renders bounds the fast mode's quality loss well under the
    blob ladder's -0.18 dB class, while the hostile-occluder collapse
    (25.0 -> 9.7 dB, round-4 hostile ladder) lands far below it.
    Returns (ok, psnr_db)."""
    import jax.numpy as jnp
    from hyperreel_tpu.train.metrics import psnr
    from hyperreel_tpu.train.render import Renderer

    idx = np.linspace(0, len(coords) - 1, n_rays).astype(int)
    probe_rays = jnp.asarray(np.asarray(coords[idx]))
    full_rgb = Renderer(model, ray_chunk=n_rays).render_rays(
        params, probe_rays, it=it)["rgb"]
    fast_rgb = Renderer(fast_model, ray_chunk=n_rays).render_rays(
        fast_params, probe_rays, it=it)["rgb"]
    d = float(psnr(np.asarray(fast_rgb), np.asarray(full_rgb)))
    return d >= gate_db, d


def serve(model, params, host="0.0.0.0", port=8090, wh=(512, 512),
          ray_width=8, time_loop_s=2.0, patch_model=None):
    """Minimal HTTP viewer: GET / returns an HTML page with drag-to-orbit;
    GET /frame?yaw=..&pitch=..&r=..&t=.. returns a PNG frame
    (the render contract of NeRFGUI.test_step, gui_utils.py:139-213)."""
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import urlparse, parse_qs
    from PIL import Image

    cam = OrbitCamera(wh[0], wh[1])
    renderer = InteractiveRenderer(model=model, params=params, base_wh=wh,
                                   ray_width=ray_width,
                                   patch_model=patch_model)
    print("precompiling resolution ladder...")
    renderer.precompile()
    t_start = time.time()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            parsed = urlparse(self.path)
            if parsed.path == "/frame":
                q = parse_qs(parsed.query)
                yaw = float(q.get("yaw", [0])[0])
                pitch = float(q.get("pitch", [0])[0])
                cam.rot = np.eye(3, dtype=np.float32)
                cam.orbit(yaw * 200, pitch * 200)
                cam.radius = float(q.get("r", [2.0])[0])
                t = float(q.get(
                    "t", [((time.time() - t_start) % time_loop_s)
                          / time_loop_s])[0])
                img, dt = renderer.render_frame(cam.pose, t=t)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, "PNG")
                data = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("X-Frame-Time", f"{dt:.3f}")
                self.end_headers()
                self.wfile.write(data)
            else:
                page = (b"<html><body style='margin:0'>"
                        b"<img id=v style='width:100vw;height:100vh;"
                        b"object-fit:contain'>"
                        b"<script>let yaw=0,pitch=0,drag=0;"
                        b"document.onmousedown=()=>drag=1;"
                        b"document.onmouseup=()=>drag=0;"
                        b"document.onmousemove=e=>{if(drag){yaw+=e.movementX"
                        b"*0.003;pitch+=e.movementY*0.003;}};"
                        b"async function loop(){const r=await fetch("
                        b"`/frame?yaw=${yaw}&pitch=${pitch}`);"
                        b"const b=await r.blob();"
                        b"v.src=URL.createObjectURL(b);"
                        b"requestAnimationFrame(loop);}loop();"
                        b"</script></body></html>")
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(page)

    server = HTTPServer((host, port), Handler)
    print(f"viewer at http://{host}:{port}/")
    server.serve_forever()
