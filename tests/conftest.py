"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip (pjit/shard_map) paths are tested without TPU hardware by
emulating 8 host devices, per SURVEY.md §4. This must run before any
``import jax`` in the test process.
"""

import os

# Force-set (not setdefault): the host environment pre-sets JAX_PLATFORMS to
# the TPU plugin, which would make "CPU" tests silently run on the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The host image's sitecustomize imports jax and registers the TPU plugin
# before conftest runs, so env vars alone are too late — override the live
# config as well.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
# Multi-device tests hard-require 8 virtual devices (mesh shapes, shard
# counts, 8-way DP == 1-device math): a different externally forced count
# would fail a dozen tests with opaque mesh errors, so fail loudly here.
assert len(jax.devices()) == 8, (
    f"tests require exactly 8 virtual CPU devices, got {len(jax.devices())} "
    f"(check an externally set --xla_force_host_platform_device_count)"
)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
