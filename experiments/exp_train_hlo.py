"""Optimized-HLO source attribution of the FINAL-SCALE training step
(round 4b): the grid-800 device trace shows one ~100 ms/step fusion
(fusion.446) plus two ~18.5 ms fusions inside the scan body — 159
ms/step where the full-schedule run measured ~20 steps/s. Dump the
compiled scan step and map the named hot ops to source lines.

  python experiments/exp_train_hlo.py [grid]
"""

import re
import sys

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    sys.path.insert(0, "experiments")
    sys.path.insert(0, "/root/repo")
    from exp_preset_sweep import _training_cfg, _mid_scale
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    log("devices:", jax.devices(), "grid:", grid)

    ds = gaussian_blob_scene(n_views=4, wh=(64, 64), dynamic=True)
    cfg = _mid_scale(
        convert_epochs_to_iters(technicolor_z_plane(), 200), grid=grid)
    model = build_model(cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
    trainer = Trainer(model, _training_cfg(),
                      regularizer_cfgs=tv_4000_defaults(),
                      iters_per_epoch=200)
    state = trainer.init_state(jax.random.PRNGKey(0))
    spc = 8
    scan_step, _ = trainer.get_train_step_scan(state.params, spc)

    it = ds.batch_iterator(16384, seed=0)
    bs = [next(it) for _ in range(spc)]
    chunk = {k: jnp.asarray(np.stack([b[k] for b in bs]))
             for k in bs[0]}
    its = jnp.arange(0, spc, dtype=jnp.int32)
    rngs = jax.random.split(jax.random.PRNGKey(1), spc)

    jf = jax.jit(scan_step)
    compiled = jf.lower(state.params, state.opt_state, chunk, its,
                        rngs).compile()
    txt = compiled.as_text()
    out = f"/tmp/hw_queue/train_hlo_{grid}.txt"
    with open(out, "w") as fh:
        fh.write(txt)
    log(f"wrote {len(txt)} bytes -> {out}")

    pat = re.compile(
        r"^\s*(?:ROOT )?%?([\w.-]+) = [^\n]*?"
        r"(fusion|while|dynamic-update-slice|copy|reshape|scatter|"
        r"gather)[^\n]*", re.M)
    meta = re.compile(r'metadata=\{([^}]*)\}')
    # the trace names the hot ops fusion.446 / fusion.435 / fusion.448 /
    # reshape.1137 / reshape.1128 — print attribution for EVERY large
    # named op so the mapping survives renumbering
    wanted = re.compile(r"(fusion|reshape|scatter|copy)\.\d+")
    for m in pat.finditer(txt):
        line = m.group(0)
        nm = m.group(1)
        if not wanted.fullmatch(nm):
            continue
        mm = meta.search(line[:4000])
        if mm:
            info = mm.group(1)
            info = re.sub(r'source_file="[^"]*/', 'file="', info)
            log(f"{nm:18s} {info[:240]}")


if __name__ == "__main__":
    main()
