"""Round-5 scatter-add probe (real TPU): the packed-scatter BACKWARD is
63% of the final-scale train step (train_trace_800b + train_hlo_800:
fusion.446, grid_sample.py:172 `.at[:, idx].add` into f32[4C, R]).
Which scatter formulation is fastest at that exact scale?

Variants (all N=524288 updates of 64 f32 into a 1008x1008-column table,
the grid-800 flagship backward shape):
  v0_cf      channels-first column scatter [4C, R].at[:, idx].add — the
             CURRENT code (each update touches 8 sublane-tiles x 1 lane).
  v1_rm      row-major [R, 4C].at[idx].add — one update = 64 contiguous
             lanes of one sublane row.
  v2_rm_s    v1 with pre-sorted indices, indices_are_sorted=True.
  v2b_rm_s0  v1 with pre-sorted indices, NO hint (locality vs hint).
  v3_rm_su   v2 + unique_indices=True (HINT-ONLY: duplicates exist, the
             RESULT is undefined — timing probe for the lowering class).
  v4_sort    in-graph lax.sort_key_val(idx, iota) + row permute of g —
             the prep cost any sorted variant pays when idx is dynamic.
  v5_dedup2  pre-sorted: cumsum rows + two boundary SET-scatters
             (sorted, first/last-of-run) + subtract — exact segment-sum
             formulation with no add-scatter at all.
  v6_winmm   pre-sorted: lax.scan over 1024 tiles of 512 samples; each
             tile builds a [K=2048, M] one-hot vs a dynamic base and
             accumulates oh @ g_tile into a K-row window via
             dynamic_update_slice — the MXU scatter-as-matmul. Reports
             overflow (samples beyond the window) for uniform density.
  v7_e2e     full jax.vjp through grid_sample_2d_cf_quad at this scale
             (fwd gather + current bwd) — the end-to-end context number.

Timing: chained state->state steps inside jit(scan), run-length
differencing, value readback (PERFORMANCE.md methodology).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "experiments")
from exp_gather_r2 import log, time_chain  # noqa: E402

H = W = 1007
R = (H + 1) * (W + 1)          # 1016064 padded quad-table columns
C4 = 64                        # 4 corners x 16 channels
N = 524288                     # 16384 rays x 32 samples


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    idx_h = rng.integers(0, R, N).astype(np.int32)
    sidx_h = np.sort(idx_h)
    g0 = jnp.asarray(rng.standard_normal((N, C4)).astype(np.float32))
    g0_cf = g0.T
    idx = jnp.asarray(idx_h)
    sidx = jnp.asarray(sidx_h)

    def consume(g, tab):
        return g + jnp.sum(tab[:1]) * 1e-20

    def consume_cf(g, tab):
        return g + jnp.sum(tab[:, :1]) * 1e-20

    def v0_cf(g):
        tab = jnp.zeros((C4, R), jnp.float32).at[:, idx].add(g)
        return consume_cf(g, tab)

    def v1_rm(g):
        tab = jnp.zeros((R, C4), jnp.float32).at[idx].add(g)
        return consume(g, tab)

    def v2_rm_s(g):
        tab = jnp.zeros((R, C4), jnp.float32).at[sidx].add(
            g, indices_are_sorted=True)
        return consume(g, tab)

    def v2b_rm_s0(g):
        tab = jnp.zeros((R, C4), jnp.float32).at[sidx].add(g)
        return consume(g, tab)

    def v3_rm_su(g):
        tab = jnp.zeros((R, C4), jnp.float32).at[sidx].add(
            g, indices_are_sorted=True, unique_indices=True)
        return consume(g, tab)

    def v4_sort(g):
        sk, perm = jax.lax.sort_key_val(idx, jnp.arange(N, dtype=jnp.int32))
        sg = g[perm]
        return g + (jnp.sum(sg[:1]) + sk[0].astype(jnp.float32)) * 1e-20

    is_bnd = jnp.asarray(
        np.concatenate([[True], sidx_h[1:] != sidx_h[:-1]]))
    is_last = jnp.asarray(
        np.concatenate([sidx_h[1:] != sidx_h[:-1], [True]]))
    DUMP = R

    def v5_dedup2(g):
        # (no sorted hint: the DUMP slot interleaves, so the index
        # vector is only piecewise sorted — a lying hint is UB)
        S = jnp.cumsum(g, 0)                    # [N, C4]
        iA = jnp.where(is_last, sidx, DUMP)
        iB = jnp.where(is_bnd, sidx, DUMP)
        A = jnp.zeros((R + 1, C4), jnp.float32).at[iA].set(S)
        B = jnp.zeros((R + 1, C4), jnp.float32).at[iB].set(S - g)
        tab = A - B
        return consume(g, tab)

    M, K, nT = 512, 2048, N // 512
    spans = sidx_h.reshape(nT, M)[:, -1] - sidx_h.reshape(nT, M)[:, 0]
    log(f"winmm spans: max {spans.max()} mean {spans.mean():.0f} "
        f"overflow_tiles(>={K}) {(spans >= K).sum()}")
    karange = jnp.arange(K, dtype=jnp.int32)

    def v6_winmm(g):
        def body(tab, t):
            rows = jax.lax.dynamic_slice(sidx, (t * M,), (M,))
            base = rows[0]
            oh = (karange[:, None] + base == rows[None, :]).astype(
                jnp.float32)                    # [K, M]
            gt = jax.lax.dynamic_slice(g, (t * M, 0), (M, C4))
            w = oh @ gt                         # [K, C4] on the MXU
            win = jax.lax.dynamic_slice(tab, (base, 0), (K, C4))
            tab = jax.lax.dynamic_update_slice(tab, win + w, (base, 0))
            return tab, None
        tab0 = jnp.zeros((R + K, C4), jnp.float32)
        tab, _ = jax.lax.scan(body, tab0, jnp.arange(nT, dtype=jnp.int32))
        return consume(g, tab)

    from hyperreel_tpu.ops.grid_sample import grid_sample_2d_cf_quad
    grid = jnp.asarray(
        rng.standard_normal((H, W, 16)).astype(np.float32))
    coords0 = jnp.asarray(
        rng.uniform(-1, 1, (N, 2)).astype(np.float32))
    cot = jnp.asarray(
        rng.standard_normal((8, N, 2)).astype(np.float32))

    def v7_e2e(c):
        out, vjpf = jax.vjp(grid_sample_2d_cf_quad, grid, c)
        gg, gc = vjpf(cot)
        return c + gc * 1e-20 + jnp.sum(gg[0, 0, :1]) * 1e-20

    # end-to-end sorted variants (sort + row permute IN-GRAPH, then the
    # fast scatter formulation — what the trainer integration pays)
    def v5s_e2e(g):
        sk, perm = jax.lax.sort_key_val(idx, jnp.arange(N, dtype=jnp.int32))
        sg = g[perm]
        S = jnp.cumsum(sg, 0)
        lastm = jnp.concatenate([sk[1:] != sk[:-1],
                                 jnp.ones((1,), bool)])
        firstm = jnp.concatenate([jnp.ones((1,), bool),
                                  sk[1:] != sk[:-1]])
        A = jnp.zeros((R + 1, C4), jnp.float32).at[
            jnp.where(lastm, sk, DUMP)].set(S)
        B = jnp.zeros((R + 1, C4), jnp.float32).at[
            jnp.where(firstm, sk, DUMP)].set(S - sg)
        return consume(g, A - B)

    def v6s_e2e(g):
        sk, perm = jax.lax.sort_key_val(idx, jnp.arange(N, dtype=jnp.int32))
        sg = g[perm]

        def body(tab, t):
            rows = jax.lax.dynamic_slice(sk, (t * M,), (M,))
            base = rows[0]
            oh = (karange[:, None] + base == rows[None, :]).astype(
                jnp.float32)
            gt = jax.lax.dynamic_slice(sg, (t * M, 0), (M, C4))
            w = oh @ gt
            win = jax.lax.dynamic_slice(tab, (base, 0), (K, C4))
            tab = jax.lax.dynamic_update_slice(tab, win + w, (base, 0))
            return tab, None
        tab0 = jnp.zeros((R + K, C4), jnp.float32)
        tab, _ = jax.lax.scan(body, tab0, jnp.arange(nT, dtype=jnp.int32))
        return consume(g, tab)

    # bigger-tile winmm (fewer scan steps, 2x matmul FLOPs)
    M2, K2, nT2 = 1024, 4096, N // 1024
    karange2 = jnp.arange(K2, dtype=jnp.int32)

    def v6b_winmm(g):
        def body(tab, t):
            rows = jax.lax.dynamic_slice(sidx, (t * M2,), (M2,))
            base = rows[0]
            oh = (karange2[:, None] + base == rows[None, :]).astype(
                jnp.float32)
            gt = jax.lax.dynamic_slice(g, (t * M2, 0), (M2, C4))
            w = oh @ gt
            win = jax.lax.dynamic_slice(tab, (base, 0), (K2, C4))
            tab = jax.lax.dynamic_update_slice(tab, win + w, (base, 0))
            return tab, None
        tab0 = jnp.zeros((R + K2, C4), jnp.float32)
        tab, _ = jax.lax.scan(body, tab0,
                              jnp.arange(nT2, dtype=jnp.int32))
        return consume(g, tab)

    for name, fn, init in [
            ("v0_cf      (current)", v0_cf, g0_cf),
            ("v1_rm", v1_rm, g0),
            ("v2_rm_s    (+sorted hint)", v2_rm_s, g0),
            ("v2b_rm_s0  (sorted, no hint)", v2b_rm_s0, g0),
            ("v3_rm_su   (UNSAFE unique hint)", v3_rm_su, g0),
            ("v4_sort    (sort+permute prep)", v4_sort, g0),
            ("v5_dedup2  (cumsum+2 set-scatters)", v5_dedup2, g0),
            ("v6_winmm   (MXU window matmul)", v6_winmm, g0),
            ("v6b_winmm  (M=1024 K=4096)", v6b_winmm, g0),
            ("v5s_e2e    (sort+permute+dedup2)", v5s_e2e, g0),
            ("v6s_e2e    (sort+permute+winmm)", v6s_e2e, g0),
            ("v7_e2e     (quad fwd+bwd vjp)", v7_e2e, coords0),
    ]:
        try:
            t = time_chain(fn, init, k1=3, k2=9)
            log(f"{name:38s} {t*1e3:8.2f} ms "
                f"({N/t/1e6:7.1f} M upd/s)")
        except Exception as e:
            log(f"{name:38s} FAILS -> {type(e).__name__}: "
                f"{str(e)[:160]}")

    # correctness cross-check (CPU-precision tolerant): v5 and v6 vs v1
    ref = np.zeros((R, C4), np.float32)
    np.add.at(ref, idx_h, np.asarray(g0))
    def run(fn_tab):
        return np.asarray(fn_tab())
    tab1 = run(lambda: jnp.zeros((R, C4), jnp.float32).at[idx].add(g0))
    log("v1 vs numpy:", float(np.abs(tab1 - ref).max()))
    gs = g0[jnp.asarray(np.argsort(idx_h, kind="stable"))]
    S = jnp.cumsum(gs, 0)
    A = jnp.zeros((R + 1, C4), jnp.float32).at[
        jnp.where(is_last, sidx, DUMP)].set(S)
    B = jnp.zeros((R + 1, C4), jnp.float32).at[
        jnp.where(is_bnd, sidx, DUMP)].set(S - gs)
    tab5 = np.asarray((A - B)[:R])
    log("v5 vs numpy:", float(np.abs(tab5 - ref).max()))
    # winmm numeric check (sorted g, window-clipped -> exact when no
    # tile overflows)
    tab6 = np.zeros((R, C4), np.float32)
    gs_h = np.asarray(gs)
    for t in range(nT):
        rows = sidx_h[t * M:(t + 1) * M]
        base = rows[0]
        rel = rows - base
        m = rel < K
        np.add.at(tab6, rows[m], gs_h[t * M:(t + 1) * M][m])
    log("v6(host emu) vs numpy:", float(np.abs(tab6 - ref).max()),
        "(nonzero => tile overflow at this density)")


if __name__ == "__main__":
    main()
