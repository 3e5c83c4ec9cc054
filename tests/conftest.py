"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests run on a
virtual 8-device CPU topology per the build contract.

Note: jax is pre-imported at interpreter startup in this environment
(sitecustomize), so env vars alone are too late — we must also call
``jax.config.update`` before any backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
