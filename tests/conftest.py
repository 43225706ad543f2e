# coding: utf-8
"""Test configuration: run JAX on a virtual 8-device CPU mesh so that
multi-device sharding paths are exercised without TPU hardware
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=8).

Note: the environment's sitecustomize registers an `axon` TPU backend and
appends it to jax_platforms at interpreter start; the config.update below
overrides that so tests stay on the virtual CPU mesh.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
