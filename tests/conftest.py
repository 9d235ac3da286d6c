"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding is validated on a forced-host-device CPU mesh exactly as
SURVEY.md §4 prescribes; the real TPU is exercised by bench.py, not the unit
suite (fast, deterministic CI-style runs).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

# The test suite opts in to on-demand compilation of the native helpers
# (utils/native.py gates implicit `make` behind this; library users must
# set it themselves or ship a prebuilt .so).
os.environ.setdefault("HRT_BUILD_NATIVE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
