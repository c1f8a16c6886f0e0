"""voxelmorph_tpu: a TPU-native (JAX/XLA/Pallas) learning-based deformable
registration framework with the capabilities of voxelmorph/voxelmorph."""

__version__ = "0.1.0"

import os as _os


def _honor_platform_env():
    """Respect an explicit JAX_PLATFORMS=cpu request.

    Some environments force-register an accelerator platform via
    jax.config.update at interpreter startup, which overrides the env var.
    If the user explicitly asked for a platform, restore their choice.
    """
    want = _os.environ.get("VXM_JAX_PLATFORM") or _os.environ.get("JAX_PLATFORMS")
    if want and want.split(",")[0] == "cpu":
        try:
            import jax
            if jax.config.jax_platforms != want:
                jax.config.update("jax_platforms", want)
        except Exception:
            pass


_honor_platform_env()

from . import generators, layers, losses, ops, py
from . import models
from . import networks  # noqa: F401  (API-parity alias module)
from . import utils  # noqa: F401  (API-parity alias: reference vxm.utils ops layer)
from . import parallel, registration, training

# Persistent compilation cache for EVERY entry point (full-resolution 3-D
# compiles take minutes on a tunneled TPU; see training.enable_compile_cache
# for the knobs). Idempotent and env-gated (VXM_COMPILE_CACHE=0).
training.enable_compile_cache()
