"""Patch-blend kernel (ops/pallas/patch_blend.py, interpret mode on
CPU) vs the pure-XLA reference blend (ops/patch_gather.py) and the
exact quad sampler.

patch_anchor_idx expects QUARTER-MAJOR lane order (fused_eval delivers
rays with original ray 4j+p at position p*N/4 + j — permuted at chunk
entry or via the rays_phase_major contract); these tests mirror that
permutation and un-permute the features back. Per-sample (u, v)
offsets are computed inside the kernel from the scalar-pack coordinate
rows (quarter-offset BlockSpec blocks)."""

import numpy as np
import jax.numpy as jnp

from hyperreel_tpu.ops.grid_sample import grid_sample_2d_cf_quad  # noqa: F401
from hyperreel_tpu.ops.patch_gather import (
    build_patch_table_2d, patch_blend as blend_ref, _unnormalize)
from hyperreel_tpu.ops.pallas.patch_blend import (
    patch_blend, patch_anchor_idx, phase_major_to_lane_major)

from tests.test_patch_gather import coherent_coords, quad_cf


def qm(x):
    """[N, ...] with 4-consecutive blocks -> quarter-major order."""
    n = x.shape[0]
    return jnp.asarray(x).reshape((n // 4, 4) + x.shape[1:]).swapaxes(
        0, 1).reshape((n,) + x.shape[1:])


def unqm_feats(feats):
    """[C, N] features in quarter-major lane order -> original order."""
    C, n = feats.shape
    return feats.reshape(C, 4, n // 4).transpose(0, 2, 1).reshape(C, n)


def fake_pack(xn, yn, m0=0, m1=1):
    """[16, N] scalar pack carrying normalized coords at rows m0/m1."""
    n = xn.shape[0]
    pack = jnp.zeros((16, n), jnp.float32)
    pack = pack.at[m0].set(xn).at[m1].set(yn)
    return pack


def run_patch_pipeline(grid, coords, px, py, blkj, m0=0, m1=1):
    """Full patch path: quarter-major permute -> table -> XLA anchors ->
    gather -> kernel blend (in-kernel uv) -> features back in the
    original order."""
    H, W, C = grid.shape
    perm = qm(np.asarray(coords))
    pack = fake_pack(jnp.asarray(perm[:, 0]), jnp.asarray(perm[:, 1]),
                     m0, m1)
    table = build_patch_table_2d(grid, px, py)
    idx, anchors = patch_anchor_idx(pack[m0], pack[m1], W, H)
    rows = table[idx]
    feats = patch_blend(rows, anchors, pack, m0=m0, m1=m1, W=W, H=H,
                        px=px, py=py, C=C, blkj=blkj)
    return unqm_feats(phase_major_to_lane_major(feats, C))


class TestPatchBlendKernel:
    def test_parity_vs_quad_and_reference(self):
        rng = np.random.default_rng(0)
        H = W = 33
        C = 16
        grid = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
        for px, py in ((4, 2), (4, 3), (8, 2)):
            coords = coherent_coords(rng, 64, 4, W, H, px, py)
            got = np.asarray(run_patch_pipeline(grid, coords, px, py,
                                                blkj=32))
            want = quad_cf(grid, coords)
            assert np.abs(got - want).max() < 1e-4, (px, py)
            # and vs the pure-XLA reference blend (same table/anchors,
            # uv rebuilt XLA-side exactly as the kernel computes it)
            perm = qm(np.asarray(coords))
            xt = _unnormalize(perm[:, 0], W)
            yt = _unnormalize(perm[:, 1], H)
            pack = fake_pack(jnp.asarray(perm[:, 0]),
                             jnp.asarray(perm[:, 1]))
            table = build_patch_table_2d(grid, px, py)
            idx, anchors = patch_anchor_idx(pack[0], pack[1], W, H)
            n = xt.shape[0]
            q = n // 4
            x0 = np.asarray(anchors[0])
            y0 = np.asarray(anchors[1])
            u = (np.asarray(xt).reshape(4, q) - x0[None]).T.reshape(-1)
            v = (np.asarray(yt).reshape(4, q) - y0[None]).T.reshape(-1)
            ref = np.asarray(blend_ref(table[idx], jnp.asarray(u),
                                       jnp.asarray(v), px, py, C))
            assert np.abs(got - ref).max() < 1e-5

    def test_non_contiguous_pack_rows(self):
        # multi-axis MAT_MODE pairs read non-adjacent pack rows
        rng = np.random.default_rng(3)
        H = W = 17
        C = 8
        grid = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
        coords = coherent_coords(rng, 32, 4, W, H, 4, 3)
        got = np.asarray(
            run_patch_pipeline(grid, coords, 4, 3, blkj=8, m0=0, m1=2))
        want = quad_cf(grid, coords)
        assert np.abs(got - want).max() < 1e-4

    def test_bf16_rows(self):
        rng = np.random.default_rng(1)
        H = W = 17
        C = 8
        grid = jnp.asarray(
            rng.normal(size=(H, W, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        coords = coherent_coords(rng, 16, 4, W, H, 4, 2)
        got = np.asarray(run_patch_pipeline(grid, coords, 4, 2, blkj=16))
        want = quad_cf(grid.astype(jnp.float32), coords)
        assert np.abs(got - want).max() < 2e-2  # bf16 table quantization

    def test_border_zero_padding(self):
        rng = np.random.default_rng(2)
        H = W = 17
        C = 8
        grid = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
        # bases clear of texel boundaries (a boundary-straddling y at
        # py=2 is a genuine coverage violation — covered in
        # test_patch_gather) but straddling the GRID border ring
        base = np.array([[-1.2, -1.2], [1.0, 1.0], [5.0, 0.1],
                         [0.97, -1.06]], np.float32)
        coords = jnp.asarray(
            np.repeat(base, 4, 0)
            + rng.uniform(0, 0.01, (16, 2)).astype(np.float32))
        got = np.asarray(run_patch_pipeline(grid, coords, 4, 2, blkj=4))
        want = quad_cf(grid, coords)
        assert np.abs(got - want).max() < 1e-4
