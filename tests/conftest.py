"""Test config: run the suite on a virtual 8-device CPU mesh.

Sharding/multi-chip paths are validated on host CPU devices
(`xla_force_host_platform_device_count`); the driver separately runs the bench
on real TPU hardware.

Note: the environment's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (remote TPU tunnel), so env vars alone are too late here —
the platform must be overridden through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
