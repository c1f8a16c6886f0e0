"""Model zoo: registration networks and checkpoint IO."""

from . import modelio, unet, vxm
from .modelio import load_model, register_model, save_model
from .unet import Unet
from .vxm import InstanceDense, Transform, VxmDense

for _cls in (VxmDense, InstanceDense, Unet):
    register_model(_cls)
