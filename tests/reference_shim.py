"""Import shim that lets the UPSTREAM reference's dataset loaders
(/root/reference/datasets) run inside this test environment, so our
loaders can be cross-validated against the reference's own pose/ray code
on identical fixture trees (real scene data is unobtainable here —
DATASETS.md "Acquisition attempts").

Stubs only packages missing from this image and only the members the
reference dataset path touches: torchvision.transforms (ToTensor/Compose/
GaussianBlur), kornia.create_meshgrid, iopath PathManager. The reference
MATH (pose parsing, ray generation, NDC) runs unmodified."""

import os
import sys
import types

import numpy as np


def install():
    if "kornia" not in sys.modules:
        import torch

        kornia = types.ModuleType("kornia")

        def create_meshgrid(H, W, normalized_coordinates=True,
                            device="cpu", dtype=None):
            if normalized_coordinates:
                xs = torch.linspace(-1.0, 1.0, W)
                ys = torch.linspace(-1.0, 1.0, H)
            else:
                xs = torch.arange(W, dtype=torch.float32)
                ys = torch.arange(H, dtype=torch.float32)
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            return torch.stack([gx, gy], -1)[None]

        kornia.create_meshgrid = create_meshgrid
        sys.modules["kornia"] = kornia

    if "torchvision" not in sys.modules:
        import torch

        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")

        class ToTensor:
            def __call__(self, img):
                arr = np.asarray(img, np.float32) / 255.0
                if arr.ndim == 2:
                    arr = arr[..., None]
                return torch.from_numpy(arr).permute(2, 0, 1).contiguous()

        class Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                for t in self.ts:
                    x = t(x)
                return x

        class GaussianBlur:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                raise NotImplementedError(
                    "blur transform not exercised by parity tests")

        transforms.ToTensor = ToTensor
        transforms.Compose = Compose
        transforms.GaussianBlur = GaussianBlur
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms

    if "iopath" not in sys.modules:
        iopath = types.ModuleType("iopath")
        common = types.ModuleType("iopath.common")
        file_io = types.ModuleType("iopath.common.file_io")

        class PathManager:
            def register_handler(self, *a, **k):
                pass

            def open(self, path, mode="r"):
                return open(path, mode)

            def ls(self, path):
                return os.listdir(path)

            def exists(self, path):
                return os.path.exists(path)

        class NativePathHandler:
            pass

        file_io.PathManager = PathManager
        file_io.NativePathHandler = NativePathHandler
        iopath.common = common
        common.file_io = file_io
        sys.modules["iopath"] = iopath
        sys.modules["iopath.common"] = common
        sys.modules["iopath.common.file_io"] = file_io

    if "pytorch3d" not in sys.modules:
        import torch

        p3d = types.ModuleType("pytorch3d")
        tfm = types.ModuleType("pytorch3d.transforms")

        def quaternion_to_matrix(q):
            # wxyz convention (pytorch3d); standard formula
            w, x, y, z = q.unbind(-1)
            two = 2.0 / (q * q).sum(-1)
            m = torch.stack([
                1 - two * (y * y + z * z), two * (x * y - z * w),
                two * (x * z + y * w),
                two * (x * y + z * w), 1 - two * (x * x + z * z),
                two * (y * z - x * w),
                two * (x * z - y * w), two * (y * z + x * w),
                1 - two * (x * x + y * y),
            ], -1)
            return m.reshape(q.shape[:-1] + (3, 3))

        def quaternion_apply(q, point):
            R = quaternion_to_matrix(q)
            return torch.einsum("...ij,...j->...i", R, point)

        def quaternion_invert(q):
            scale = q.new_tensor([1, -1, -1, -1])
            return q * scale

        tfm.quaternion_to_matrix = quaternion_to_matrix
        tfm.quaternion_apply = quaternion_apply
        tfm.quaternion_invert = quaternion_invert
        p3d.transforms = tfm
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.transforms"] = tfm

    if "plyfile" not in sys.modules:
        ply = types.ModuleType("plyfile")

        class _PlyStub:
            def __init__(self, *a, **k):
                raise NotImplementedError(
                    "plyfile not exercised by parity tests")

        ply.PlyData = _PlyStub
        ply.PlyElement = _PlyStub
        sys.modules["plyfile"] = ply

    if "skimage" not in sys.modules:
        # utils/tensorf_utils.py imports skimage.metrics at module level
        try:
            import skimage  # noqa: F401
        except ImportError:
            sk = types.ModuleType("skimage")
            m = types.ModuleType("skimage.metrics")

            def _nope(*a, **k):
                raise NotImplementedError("skimage stub")

            m.structural_similarity = _nope
            m.peak_signal_noise_ratio = _nope
            m._is_hyperreel_stub = True  # lets tests skip instead of call
            meas = types.ModuleType("skimage.measure")
            meas.marching_cubes = _nope
            sk.metrics = m
            sk.measure = meas
            sk.__path__ = []  # mark as package for submodule imports
            sys.modules["skimage"] = sk
            sys.modules["skimage.metrics"] = m
            sys.modules["skimage.measure"] = meas

    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class OmegaConf:
            @staticmethod
            def set_struct(*a, **k):
                pass

        om.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = om

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    # the reference hardcodes device='cuda' in tensor factories and
    # .cuda() on modules/tensors (e.g. nlf/param.py:238,
    # nlf/intersect/primitive.py samples); torch here is CPU-only, so
    # remap those to CPU — the MATH is unchanged
    import torch
    if not getattr(torch, "_hyperreel_cpu_patched", False):
        def _wrap(f):
            def g(*a, **k):
                dev = k.get("device")
                if dev is not None and "cuda" in str(dev):
                    k["device"] = "cpu"
                return f(*a, **k)
            return g

        for fname in ("tensor", "zeros", "ones", "randn", "randint",
                      "linspace", "arange", "rand", "full", "empty"):
            setattr(torch, fname, _wrap(getattr(torch, fname)))
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self

        def _to_wrap(orig):
            def g(self, *a, **k):
                a = tuple(
                    "cpu" if (isinstance(x, (str, torch.device))
                              and "cuda" in str(x)) else x
                    for x in a)
                if k.get("device") is not None and \
                        "cuda" in str(k["device"]):
                    k["device"] = "cpu"
                return orig(self, *a, **k)
            return g

        torch.Tensor.to = _to_wrap(torch.Tensor.to)
        torch.nn.Module.to = _to_wrap(torch.nn.Module.to)
        torch._hyperreel_cpu_patched = True

    # `import nlf.models.models` must NOT execute the reference's
    # nlf/__init__.py (it pulls pytorch-lightning / imageio / full
    # omegaconf — absent here). Register a stub package whose __path__
    # points at the reference tree so submodule imports resolve normally.
    if "nlf" not in sys.modules:
        nlf_pkg = types.ModuleType("nlf")
        nlf_pkg.__path__ = ["/root/reference/nlf"]
        nlf_pkg.__package__ = "nlf"
        sys.modules["nlf"] = nlf_pkg


class Cfg:
    """Minimal omegaconf-DictConfig stand-in: attribute access,
    `in`, indexing, keys()."""

    def __init__(self, d):
        self._d = {}
        for k, v in d.items():
            self._d[k] = Cfg(v) if isinstance(v, dict) else v

    def __getattr__(self, k):
        if k.startswith("_"):
            raise AttributeError(k)
        try:
            return self._d[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        if k.startswith("_"):
            object.__setattr__(self, k, v)
        else:
            self._d[k] = v

    def __contains__(self, k):
        return k in self._d

    def __getitem__(self, k):
        return self._d[k]

    def __setitem__(self, k, v):
        self._d[k] = v

    def keys(self):
        return self._d.keys()
