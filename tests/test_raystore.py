"""Native mmap ray-store tests (C++ sampler via ctypes)."""

import os
import tempfile

import numpy as np
import pytest

from hyperreel_tpu.data.synthetic import gaussian_blob_scene
from hyperreel_tpu.data.raystore import MmapRayStore, build_extension


@pytest.fixture(scope="module")
def store():
    try:
        build_extension()
    except Exception:
        pytest.skip("g++ unavailable")
    ds = gaussian_blob_scene(n_views=2, wh=(16, 16))
    path = tempfile.mktemp(suffix=".npy")
    s = MmapRayStore.create(path, ds)
    yield s, ds
    os.remove(path)


def test_sample_shapes_and_determinism(store):
    s, ds = store
    b = s.sample(512, seed=7)
    assert b["rays"].shape == (512, 6)
    assert b["rgb"].shape == (512, 3)
    b2 = s.sample(512, seed=7)
    np.testing.assert_array_equal(b["rays"], b2["rays"])
    b3 = s.sample(512, seed=8)
    assert not np.array_equal(b["rays"], b3["rays"])


def test_rows_are_real_rows(store):
    s, ds = store
    b = s.sample(64, seed=1)
    full = np.concatenate([ds.all_coords, ds.all_rgb, ds.all_weights], -1)
    for i in range(0, 64, 16):
        row = np.concatenate([b["rays"][i], b["rgb"][i], b["weights"][i]])
        assert (np.abs(full - row) < 1e-6).all(-1).any()


def test_gather_explicit_indices(store):
    s, ds = store
    g = s.gather(np.array([5, 0, 17]))
    np.testing.assert_allclose(g["rays"], ds.all_coords[[5, 0, 17]])
    np.testing.assert_allclose(g["rgb"], ds.all_rgb[[5, 0, 17]])


def test_batch_iterator(store):
    s, ds = store
    it = s.batch_iterator(128, seed=3)
    a = next(it)
    b = next(it)
    assert a["rays"].shape == (128, 6)
    assert not np.array_equal(a["rays"], b["rays"])
