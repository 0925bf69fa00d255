"""Chunked rendering driver (reference: nlf/rendering.py).

The reference chunks twice in Python (`ray_chunk` outer, `net_chunk` inner,
nlf/rendering.py:45-56,100-150); on TPU one jitted forward over a padded
static chunk is enough — rays are padded to the chunk size so a single
compiled program serves every image size.

Multi-chunk device calls: dispatching each chunk separately costs a host
round trip per chunk (~50 ms through a tunnelled device) plus a synchronous
readback; `lax.map` over `chunks_per_call` stacked chunks renders a
megapixel frame in one-to-two device calls with a single readback at the
end, while keeping per-chunk peak memory (lax.map runs sequentially).
"""

import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.models.ctx import make_ctx


class Renderer:
    def __init__(self, model, ray_chunk=65536, chunks_per_call=4):
        self.model = model
        self.ray_chunk = int(ray_chunk)
        self.chunks_per_call = int(chunks_per_call)
        self._jitted = {}

    def _forward(self, key):
        if key not in self._jitted:
            fields = key

            def fwd(params, rays, it):
                ctx = make_ctx(it=it, training=False)
                kw = {"fields": list(fields)} if fields else {}
                return self.model.apply(params, rays, ctx, kw)

            self._jitted[key] = jax.jit(fwd)
        return self._jitted[key]

    def _forward_multi(self, fields, k):
        key = (tuple(fields), k)
        if key not in self._jitted:

            def fwd(params, chunks, it):
                ctx = make_ctx(it=it, training=False)
                kw = {"fields": list(fields)} if fields else {}

                def one(rays):
                    return self.model.apply(params, rays, ctx, kw)

                return jax.lax.map(one, chunks)

            self._jitted[key] = jax.jit(fwd)
        return self._jitted[key]

    def render_rays(self, params, rays, it=0, fields=()):
        """Chunked forward over [N, C] rays -> dict of [N, ...] arrays."""
        n = rays.shape[0]
        chunk = self.ray_chunk
        n_chunks = int(math.ceil(n / chunk))
        pad_total = n_chunks * chunk - n
        rays_p = np.asarray(rays)
        if pad_total > 0:
            rays_p = np.concatenate(
                [rays_p, np.repeat(rays_p[-1:], pad_total, 0)], 0)
        it_dev = jnp.asarray(it, jnp.int32)

        # device outputs are collected and converted to numpy ONCE at the
        # end: np.asarray per chunk would pay a synchronous device round
        # trip each time
        dev_outs = []
        K = max(self.chunks_per_call, 1)
        i = 0
        while i < n_chunks:
            if n_chunks - i >= K and K > 1:
                batch = rays_p[i * chunk:(i + K) * chunk].reshape(
                    K, chunk, -1)
                out = self._forward_multi(fields, K)(
                    params, jnp.asarray(batch), it_dev)
                dev_outs.append(out)  # dict of [K, chunk, ...]
                i += K
            else:
                cur = rays_p[i * chunk:(i + 1) * chunk]
                out = self._forward(tuple(fields))(
                    params, jnp.asarray(cur), it_dev)
                dev_outs.append({k: v[None] for k, v in out.items()})
                i += 1
        res = {}
        for k in dev_outs[0].keys():
            parts = [np.asarray(o[k]).reshape(-1, *o[k].shape[2:])
                     for o in dev_outs]
            res[k] = np.concatenate(parts, 0)[:n]
        return res

    def render_image(self, params, rays, wh, it=0, fields=()):
        W, H = wh
        out = self.render_rays(params, rays, it, fields)
        return {k: v.reshape(H, W, *v.shape[1:]) for k, v in out.items()}
