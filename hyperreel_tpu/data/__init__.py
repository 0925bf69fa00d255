"""Dataset registry (reference: datasets/__init__.py dataset_dict)."""

from hyperreel_tpu.data.base import RayDataset
from hyperreel_tpu.data.synthetic import (
    gaussian_blob_scene, random_ray_dataset)


def _lazy(name):
    def loader(*args, **kwargs):
        import importlib
        mod, fn = name.rsplit(".", 1)
        return getattr(importlib.import_module(mod), fn)(*args, **kwargs)

    return loader


dataset_dict = {
    "llff": _lazy("hyperreel_tpu.data.llff.load_llff"),
    "blender": _lazy("hyperreel_tpu.data.blender.load_blender"),
    "donerf": _lazy("hyperreel_tpu.data.donerf.load_donerf"),
    "technicolor": _lazy("hyperreel_tpu.data.technicolor.load_technicolor"),
    "neural_3d": _lazy("hyperreel_tpu.data.neural_3d.load_neural_3d"),
    "immersive": _lazy("hyperreel_tpu.data.immersive.load_immersive"),
    "stanford": _lazy("hyperreel_tpu.data.stanford.load_stanford_lightfield"),
    "shiny": _lazy("hyperreel_tpu.data.shiny.load_shiny"),
    "spaces": _lazy("hyperreel_tpu.data.spaces.load_spaces"),
    "eikonal": _lazy("hyperreel_tpu.data.eikonal.load_eikonal"),
    "stanford_llff": _lazy("hyperreel_tpu.data.variants.load_stanford_llff"),
    "dense_shiny": _lazy("hyperreel_tpu.data.variants.load_dense_shiny"),
    "dense_blender": _lazy("hyperreel_tpu.data.variants.load_dense_blender"),
    "blender_lightfield": _lazy(
        "hyperreel_tpu.data.variants.load_blender_lightfield"),
    "catacaustics": _lazy("hyperreel_tpu.data.catacaustics.load_catacaustics"),
    "video3d_static": _lazy("hyperreel_tpu.data.video3d.load_video3d_static"),
    "video3d_time": _lazy("hyperreel_tpu.data.video3d.load_video3d_time"),
    "video3d_ground_truth": _lazy(
        "hyperreel_tpu.data.video3d.load_video3d_ground_truth"),
    "fourier": _lazy("hyperreel_tpu.data.aux_datasets.fourier_dataset"),
    "random_ray": _lazy("hyperreel_tpu.data.aux_datasets.random_ray_view_dataset"),
    "random_pixel": _lazy("hyperreel_tpu.data.aux_datasets.random_pixel_dataset"),
    "synthetic_blobs": gaussian_blob_scene,
    "random": random_ray_dataset,
}


def get_dataset(name, *args, **kwargs):
    return dataset_dict[name](*args, **kwargs)
