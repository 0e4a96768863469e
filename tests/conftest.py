"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip (pjit/shard_map) paths are tested without TPU hardware by
emulating 8 host devices, per SURVEY.md §4. This must run before any
``import jax`` in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
