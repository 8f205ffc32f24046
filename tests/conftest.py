"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip behavior is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices (the same mechanism the driver's
``dryrun_multichip`` uses).  Must run before jax is imported anywhere.
"""

import os
import sys

# The container's sitecustomize registers the axon TPU PJRT plugin in every
# python process when PALLAS_AXON_POOL_IPS is set, opening a tunnel
# handshake that serializes processes on the single chip grant (~10x test
# slowdown, and stalls when two test processes overlap).  Tests are
# CPU-only by design, so re-exec once with the registration disabled.
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "DISPU_TEST_REEXECED"
):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["DISPU_TEST_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env
    )

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # env may pin a TPU platform; tests use CPU
# Keep math reproducible and close to TPU f32 semantics.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
