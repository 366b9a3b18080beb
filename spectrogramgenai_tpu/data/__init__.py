from spectrogramgenai_tpu.data.transforms import renorm_m1_1, expand_channels, resize_image
from spectrogramgenai_tpu.data.manifest import load_specdata_manifest, class_names_from_folder

__all__ = [
    "renorm_m1_1",
    "expand_channels",
    "resize_image",
    "load_specdata_manifest",
    "class_names_from_folder",
]
