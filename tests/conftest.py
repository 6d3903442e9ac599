"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes. Mirrors SURVEY.md §4 implication
(d): multi-chip tests via xla_force_host_platform_device_count.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin force-selects itself programmatically (ignores the
# JAX_PLATFORMS env var), so pin the platform through the config API unless
# the user explicitly asks for TPU tests.
if os.environ.get("LYCORIS_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.key(0)


def reference_lycoris():
    """Import the PyTorch reference library (read-only, CPU) for golden tests.

    The reference needs the ``toml`` package which isn't installed; stub it
    (we never use reference preset loading in tests).
    """
    import sys
    import types

    if "toml" not in sys.modules:
        stub = types.ModuleType("toml")
        stub.load = lambda f: {}
        stub.loads = lambda s: {}
        sys.modules["toml"] = stub
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import lycoris as ref_lycoris

    return ref_lycoris


@pytest.fixture(scope="session")
def ref():
    return reference_lycoris()
