"""API-parity alias: ``vxm.networks.*`` like the reference package layout.

The real implementations live in ``voxelmorph_tpu.models``.
"""

from .models import *  # noqa: F401,F403
from .models.unet import Unet, default_unet_features  # noqa: F401
from .models.vxm import InstanceDense, Transform, VxmDense  # noqa: F401
