from neuralsim_tpu.data.blender import load_linemod_data, load_data_param
from neuralsim_tpu.data.convert_torch import (
    convert_torch_checkpoint,
    load_nerf_checkpoint,
)

__all__ = [
    "load_linemod_data",
    "load_data_param",
    "convert_torch_checkpoint",
    "load_nerf_checkpoint",
]
