"""API-parity alias: ``vxm.utils.*`` like the reference package layout.

The reference exposes its tensor-ops layer as ``vxm.utils`` (reference
voxelmorph/tf/utils/utils.py + augment.py); here the real implementations
live in ``voxelmorph_tpu.ops`` (interp/warp/affine/augment), and this module
re-exports them so reference call sites port without edits.
"""

from .ops import *  # noqa: F401,F403
from .ops.interp import interpn, resize  # noqa: F401
