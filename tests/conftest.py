"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated
on XLA:CPU with forced host device count (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pre-register an accelerator platform; tests always run
# on the virtual 8-device CPU mesh unless explicitly opted out.
if not os.environ.get("GMPNP_TEST_ACCEL"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_utilities():
    """Path to the read-only reference data dir, or skip if absent."""
    p = REFERENCE_DIR / "utilities"
    if not p.exists():
        pytest.skip("reference data not mounted")
    return p
