"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends — this file is
imported by pytest before any test module imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Disable the adaptive windowed-warp default for model-level tests: compiling
# both lax.cond branches is very slow on the CPU test host. The windowed and
# Pallas implementations keep full coverage via their dedicated tests, which
# pass explicit halo arguments (tests/test_windowed.py, tests/test_pallas.py).
os.environ.setdefault("VXM_WINDOW_HALO", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform via
# jax.config.update, which overrides the env var — override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
