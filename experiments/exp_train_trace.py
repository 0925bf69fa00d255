"""Device trace of a post-upsample-scale training segment (VERDICT r2
item 9 / CLAUDE.md 3b): the flagship dynamic model at a 256^3-class
grid, batch 16384, steps_per_call=8 — where does the device time go
once dispatch is no longer the wall?

  python experiments/exp_train_trace.py [grid]
"""

import collections
import glob
import gzip
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    sys.path.insert(0, "experiments")
    from exp_preset_sweep import _training_cfg, _mid_scale
    from hyperreel_tpu.configs.presets import (
        technicolor_z_plane, convert_epochs_to_iters)
    from hyperreel_tpu.data.synthetic import gaussian_blob_scene
    from hyperreel_tpu.models.model import build_model
    from hyperreel_tpu.train.trainer import Trainer
    from hyperreel_tpu.train.regularizers import tv_4000_defaults

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    # A/B knob (round 4b): "notv" drops the tensorf regularizer to
    # isolate the TV+L1 share of the final-scale step; "l1" keeps L1
    # but zeroes the TV weights (the reference's post-120K regime)
    mode = sys.argv[2] if len(sys.argv) > 2 else "tv"
    log("devices:", jax.devices(), "grid:", grid, "mode:", mode)

    ds = gaussian_blob_scene(n_views=4, wh=(64, 64), dynamic=True)
    cfg = _mid_scale(
        convert_epochs_to_iters(technicolor_z_plane(), 200), grid=grid)
    model = build_model(cfg, dataset_info=ds.info(),
                        compute_dtype=jnp.bfloat16)
    regs = tv_4000_defaults()
    if mode == "notv":
        regs = None
    elif mode == "l1":
        regs["tensorf"]["TV_weight_density"] = 0.0
        regs["tensorf"]["TV_weight_app"] = 0.0
    trainer = Trainer(model, _training_cfg(),
                      regularizer_cfgs=regs,
                      iters_per_epoch=200)
    state = trainer.init_state(jax.random.PRNGKey(0))
    spc = 8
    scan_step, _ = trainer.get_train_step_scan(state.params, spc)

    def chunk(seed):
        it = ds.batch_iterator(16384, seed=seed)
        bs = [next(it) for _ in range(spc)]
        return {k: jnp.asarray(np.stack([b[k] for b in bs]))
                for k in bs[0]}

    params, opt_state = state.params, state.opt_state
    its = jnp.arange(0, spc, dtype=jnp.int32)
    rngs = jax.random.split(jax.random.PRNGKey(1), spc)
    # warm (compile) + one executed call
    params, opt_state, m = scan_step(params, opt_state, chunk(0), its,
                                     rngs)
    jax.block_until_ready(m)
    params, opt_state, m = scan_step(params, opt_state, chunk(1), its,
                                     rngs)
    jax.block_until_ready(m)

    d = "/tmp/train_trace"
    with jax.profiler.trace(d):
        params, opt_state, m = scan_step(params, opt_state, chunk(2),
                                         its, rngs)
        jax.block_until_ready(m)

    files = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as fh:
        tr = json.load(fh)
    pid_names = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    tot = collections.Counter()
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids and "dur" in ev:
            name = ev.get("name", "?")
            tot[name] += ev["dur"]
            # leaf sum: parent spans ("0", jit_*, the scan's while.*)
            # re-count their children (the round-4b grid-800 run
            # triple-counted: 3819 "ms device" for a 1270 ms scan)
            if not (name == "0" or name.startswith("jit_")
                    or name.startswith("while")):
                total += ev["dur"]
    dev_ms = total / 1e3
    log(f"== {spc}-step scan: {dev_ms:.1f} ms device "
        f"({dev_ms/spc:.2f} ms/step, "
        f"{16384*spc/(dev_ms/1e3)/1e6:.2f} Mrays/s train)")
    for k, v in tot.most_common(25):
        log(f"   {v/1e3:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
