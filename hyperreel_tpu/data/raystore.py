"""Memory-mapped ray store with a native C++ sampler (SURVEY.md §7 hard
part 4: dynamic scenes hold ~1e8 rays; the reference keeps them as resident
torch tensors and samples from Python).

The store is one float32 .npy on disk (rows = [coords | rgb | weight]),
opened with np.memmap; batches are gathered by the C++ extension
(native/raystore.cpp) with replacement sampling in worker threads. Falls
back to numpy when the extension isn't built.

Build: `python -m hyperreel_tpu.data.raystore build` (uses g++).
"""

import ctypes
import os
import subprocess

import numpy as np

from hyperreel_tpu.data.base import RayDataset

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libraystore.so")
_SRC_PATH = os.path.join(os.path.dirname(_LIB_PATH), "raystore.cpp")


def build_extension(force=False):
    """Compile the C++ sampler with g++ (no pybind11 needed: C ABI +
    ctypes)."""
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC_PATH, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True)
    return _LIB_PATH


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        try:
            build_extension()
        except Exception:
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.raystore_sample.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64, ctypes.c_int]
    lib.raystore_gather.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.stride_mask_indices.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p]
    lib.stride_mask_indices.restype = ctypes.c_int64
    _LIB = lib
    return lib


class MmapRayStore:
    """Disk-backed [N, C] float32 ray store with native batch sampling."""

    def __init__(self, path, coords_width, n_threads=None):
        self.path = path
        self.data = np.load(path, mmap_mode="r")
        assert self.data.dtype == np.float32 and self.data.ndim == 2
        self.coords_width = coords_width
        self.n_threads = n_threads or min(os.cpu_count() or 1, 8)
        self._lib = _load_lib()

    @classmethod
    def create(cls, path, dataset: RayDataset):
        """Materialize a RayDataset into an on-disk store."""
        rows = np.concatenate(
            [dataset.all_coords, dataset.all_rgb, dataset.all_weights],
            -1).astype(np.float32)
        np.save(path, rows)
        store = cls(path if path.endswith(".npy") else path + ".npy",
                    dataset.all_coords.shape[-1])
        store.info = dataset.info()
        return store

    @property
    def num_rays(self):
        return self.data.shape[0]

    def sample(self, batch_size, seed):
        out = np.empty((batch_size, self.data.shape[1]), np.float32)
        if self._lib is not None:
            self._lib.raystore_sample(
                self.data.ctypes.data if isinstance(self.data, np.ndarray)
                else None,
                self.data.shape[0], self.data.shape[1],
                out.ctypes.data, batch_size, np.uint64(seed),
                self.n_threads)
        else:
            rng = np.random.default_rng(seed)
            idx = rng.integers(0, self.num_rays, batch_size)
            out[:] = self.data[idx]
        return self._split(out)

    def gather(self, indices):
        indices = np.ascontiguousarray(indices, np.int64)
        out = np.empty((len(indices), self.data.shape[1]), np.float32)
        if self._lib is not None:
            self._lib.raystore_gather(
                self.data.ctypes.data, self.data.shape[0],
                self.data.shape[1], indices.ctypes.data, out.ctypes.data,
                len(indices), self.n_threads)
        else:
            out[:] = self.data[indices]
        return self._split(out)

    def _split(self, rows):
        cw = self.coords_width
        return {
            "rays": rows[:, :cw],
            "rgb": rows[:, cw:cw + 3],
            "weights": rows[:, cw + 3:cw + 4],
        }

    def batch_iterator(self, batch_size, seed=0):
        step = 0
        while True:
            yield self.sample(batch_size, seed * 1_000_003 + step)
            step += 1


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build_extension(force=True))
