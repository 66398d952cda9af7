"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/multi-chip tests emulate a pod slice on host CPU (the driver
separately dry-runs the real multi-chip path via __graft_entry__.py).

NOTE on this machine: /root/.axon_site/sitecustomize.py registers the axon
TPU backend in every interpreter and force-sets jax_platforms="axon,cpu" —
the JAX_PLATFORMS env var alone is NOT enough.  We re-update the config
after import, which wins.  Also: the single TPU chip grant is exclusive
per process — never run tests concurrently with another JAX/TPU process.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_RESOURCES = "/root/reference/src/test/resources"
