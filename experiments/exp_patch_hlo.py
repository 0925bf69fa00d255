"""Dump the optimized HLO of the patch eval chunk (compile cached from
the trace runs) and map the hot trace ops (multiply_reduce_fusion.*,
dynamic-update-slice.*, while.*, fusion.2/.3, reshape/copy) to source
via op metadata.

  python experiments/exp_patch_hlo.py [patch|quad]
"""

import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "experiments")
from exp_cf_model import log, rays_chunk  # noqa: E402
from exp_patch_trace import build_patch  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "patch"
    fn, params = build_patch(which)
    rays = rays_chunk(1 << 18)
    it = jnp.asarray(0, jnp.int32)
    rng = jax.random.PRNGKey(1)
    jf = jax.jit(fn)
    compiled = jf.lower(params, rays, it, rng).compile()
    txt = compiled.as_text()
    out = f"/tmp/hw/patch_hlo_{which}.txt"
    with open(out, "w") as fh:
        fh.write(txt)
    log(f"wrote {len(txt)} bytes -> {out}")
    # summarize: for every fusion/while/dus/copy/reshape/concatenate
    # root op, print name + metadata op_name/source
    pat = re.compile(
        r"^\s*(?:ROOT )?%?([\w.-]+) = [^\n]*?"
        r"(fusion|while|dynamic-update-slice|copy|reshape|concatenate|"
        r"custom-call|gather|scatter)[^\n]*", re.M)
    meta = re.compile(r'metadata=\{([^}]*)\}')
    for m in pat.finditer(txt):
        line = m.group(0)
        if len(line) > 4000:
            line = line[:4000]
        mm = meta.search(line)
        if mm and ("fusion" in m.group(2) or "while" in m.group(2)
                   or "dynamic-update" in m.group(2)):
            info = mm.group(1)
            info = re.sub(r'source_file="[^"]*/', 'file="', info)
            log(f"{m.group(1)[:40]:42s} {info[:260]}")


if __name__ == "__main__":
    main()
