"""Round-3 channels-first probes (CLAUDE.md design sketch, step 4).

Measures the isolated costs that decide the CF eval-pipeline design:
  1. pack relayout: [16, S, B] f32 -> [16, B*S] ray-major + idx [S, B] i32
     -> [B*S]  (the ONE conversion point from CF world to the kernel's
     ray-major world)
  2. CF bitonic sort (leading axis of [S, B]) vs row-major ([B, S])
  3. field-row extraction from a transposed MLP output [480, B] (strided
     major-axis slices) vs the current [B, 480] -> [B, 32, 15] reshape
  4. the 6x256 prediction MLP channels-first ([C, B] activations) vs
     row-major ([B, C])

Each candidate is traced (device-stream op-duration sum) — chained-wall
timing through the axon tunnel is untrustworthy (PERFORMANCE.md).
"""

import collections
import glob
import gzip
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

B = 1 << 18
S = 32
F = 15  # preds_per_z


def log(*a):
    print(*a, flush=True)


def trace_ms(name, fn, *args):
    jf = jax.jit(fn)
    out = jf(*args)
    jax.block_until_ready(out)
    out = jf(*args)
    jax.block_until_ready(out)
    d = f"/tmp/cfprobe_{name}"
    with jax.profiler.trace(d):
        out = jf(*args)
        jax.block_until_ready(out)
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
            tot[ev.get("name", "?")] += ev["dur"]
            total += ev["dur"]
    log(f"== {name}: {total/1e3:.2f} ms device")
    for k, v in tot.most_common(8):
        log(f"   {v/1e3:8.2f} ms  {k}")
    return total / 1e3


def cf_sort(x):  # [S, B] leading-axis bitonic (S = pow2)
    n = S
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            m = n // (2 * j)
            y = x.reshape(m, 2, j, B)
            a, b = y[:, 0], y[:, 1]
            base = np.arange(m) * (2 * j)
            asc = jnp.asarray((base & k) == 0)[:, None, None]
            lo = jnp.minimum(a, b)
            hi = jnp.maximum(a, b)
            na = jnp.where(asc, lo, hi)
            nb = jnp.where(asc, hi, lo)
            x = jnp.stack([na, nb], 1).reshape(n, B)
            j //= 2
        k *= 2
    return x


def main():
    log("devices:", jax.devices())
    key = jax.random.PRNGKey(0)

    # --- 1. pack + idx relayout (CF -> kernel ray-major world)
    pack_cf = jax.random.normal(key, (16, S, B), jnp.float32)
    idx_cf = jax.random.randint(key, (S, B), 0, 130000, jnp.int32)

    def relayout(p, i):
        pk = p.transpose(0, 2, 1).reshape(16, B * S)
        ix = i.T.reshape(-1)
        return pk, ix

    trace_ms("pack_relayout", relayout, pack_cf, idx_cf)

    # --- 2. sort
    z_cf = jax.random.normal(key, (S, B), jnp.float32)
    z_rm = jax.random.normal(key, (B, S), jnp.float32)
    trace_ms("cf_sort", cf_sort, z_cf)

    from hyperreel_tpu.ops.sort_network import bitonic_sort
    trace_ms("rm_sort", lambda x: bitonic_sort(x), z_rm)

    # sort in context: preceded by row math, followed by row consumption
    def cf_sort_ctx(z, o):
        d = (z - 0.3) * 2.0
        d = cf_sort(d)
        return o + 1.7 * d  # points row math

    trace_ms("cf_sort_ctx", cf_sort_ctx, z_cf, z_cf + 1)

    def rm_sort_ctx(z, o):
        d = (z - 0.3) * 2.0
        d = bitonic_sort(d)
        return o + 1.7 * d

    trace_ms("rm_sort_ctx", rm_sort_ctx, z_rm, z_rm + 1)

    # --- 3. field extraction
    out_cf = jax.random.normal(key, (S * F, B), jnp.float32)
    out_rm = jax.random.normal(key, (B, S * F), jnp.float32)

    def extract_cf(o):
        z = o[0::F]
        fl = [o[c::F] for c in (1, 2, 3)]
        sg = o[4::F]
        po = [o[c::F] for c in (6, 7, 8)]
        cs = [o[c::F] for c in (9, 10, 11)]
        return (z * 2 + sg + fl[0] + fl[1] + fl[2]
                + po[0] + po[1] + po[2] + cs[0] + cs[1] + cs[2])

    def extract_rm(o):
        p = o.reshape(B, S, F)
        z = p[..., 0]
        fl = p[..., 1:4]
        sg = p[..., 4]
        po = p[..., 6:9]
        cs = p[..., 9:12]
        return (z * 2 + sg + fl.sum(-1) + po.sum(-1) + cs.sum(-1))

    trace_ms("extract_cf", extract_cf, out_cf)
    trace_ms("extract_rm", extract_rm, out_rm)

    # --- 4. MLP
    hid, nin, nout = 256, 26, S * F
    ks = jax.random.split(key, 16)
    Ws = [jax.random.normal(ks[0], (nin, hid)) * 0.05,
          jax.random.normal(ks[1], (hid, hid)) * 0.05,
          jax.random.normal(ks[2], (hid, hid)) * 0.05,
          jax.random.normal(ks[3], (hid + nin, hid)) * 0.05,
          jax.random.normal(ks[4], (hid, hid)) * 0.05,
          jax.random.normal(ks[5], (hid, nout)) * 0.05]
    bs = [jnp.zeros(w.shape[1]) for w in Ws]
    x_rm = jax.random.normal(ks[6], (B, nin), jnp.float32)
    x_cf = jax.random.normal(ks[6], (nin, B), jnp.float32)

    def mlp_rm(x):
        inp = x
        h = x
        for i, (w, b) in enumerate(zip(Ws, bs)):
            if i == 3:
                h = jnp.concatenate([inp, h], -1)
            h = (h.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)
                 ).astype(jnp.float32) + b
            if i < len(Ws) - 1:
                h = jax.nn.leaky_relu(h)
        return h  # [B, 480]

    def mlp_cf(x):
        inp = x
        h = x
        for i, (w, b) in enumerate(zip(Ws, bs)):
            if i == 3:
                h = jnp.concatenate([inp, h], 0)
            h = (w.T.astype(jnp.bfloat16) @ h.astype(jnp.bfloat16)
                 ).astype(jnp.float32) + b[:, None]
            if i < len(Ws) - 1:
                h = jax.nn.leaky_relu(h)
        return h  # [480, B]

    trace_ms("mlp_rm", mlp_rm, x_rm)
    trace_ms("mlp_cf", mlp_cf, x_cf)

    # --- 5. parity spot check (CPU-verifiable math identities)
    z = np.random.RandomState(0).rand(S, 64).astype(np.float32)
    got = np.asarray(cf_sort(jnp.asarray(np.pad(
        z, ((0, 0), (0, B - 64))))))[:, :64]
    want = np.sort(z, axis=0)
    log("cf_sort parity:", float(np.abs(got - want).max()))


if __name__ == "__main__":
    main()
