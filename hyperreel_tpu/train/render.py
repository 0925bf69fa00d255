"""Chunked rendering driver (reference: nlf/rendering.py).

The reference chunks twice in Python (`ray_chunk` outer, `net_chunk` inner,
nlf/rendering.py:45-56,100-150); on TPU one jitted forward over a padded
static chunk is enough — rays are padded to the chunk size so a single
compiled program serves every image size.
"""

import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from hyperreel_tpu.models.ctx import make_ctx


class Renderer:
    def __init__(self, model, ray_chunk=65536):
        self.model = model
        self.ray_chunk = int(ray_chunk)
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

    def render_rays(self, params, rays, it=0, fields=()):
        """Chunked forward over [N, C] rays -> dict of [N, ...] arrays."""
        n = rays.shape[0]
        chunk = self.ray_chunk
        fwd = self._forward(tuple(fields))
        outs = []
        for start in range(0, n, chunk):
            cur = rays[start:start + chunk]
            pad = chunk - cur.shape[0]
            if pad > 0:
                cur = np.concatenate(
                    [cur, np.repeat(cur[-1:], pad, 0)], 0)
            out = fwd(params, jnp.asarray(cur), jnp.asarray(it, jnp.int32))
            out = {k: np.asarray(v)[: chunk - pad if pad else chunk]
                   for k, v in out.items()}
            outs.append(out)
        return {k: np.concatenate([o[k] for o in outs], 0)
                for k in outs[0].keys()}

    def render_image(self, params, rays, wh, it=0, fields=()):
        W, H = wh
        out = self.render_rays(params, rays, it, fields)
        return {k: v.reshape(H, W, *v.shape[1:]) for k, v in out.items()}
