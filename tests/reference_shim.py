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

    def __contains__(self, k):
        return k in self._d

    def __getitem__(self, k):
        return self._d[k]

    def keys(self):
        return self._d.keys()
