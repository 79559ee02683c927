"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip logic is tested without TPU hardware per SURVEY.md section 4: CPU
devices simulate the mesh; the driver separately dry-runs the multi-chip path.
"""
import os

# The environment's sitecustomize force-registers the axon TPU backend and sets
# JAX_PLATFORMS=axon; jax.config.update after import is the reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib
import subprocess

import pytest

REFERENCE_TEST_DATA = pathlib.Path("/root/reference/test")
GOLDEN = pathlib.Path(__file__).parent / "golden"
REF_BINARY = pathlib.Path("/root/repo/.ref/bin/refnorm")


@pytest.fixture(scope="session")
def ref_binary():
    """Compile the reference binary on demand (gitignored)."""
    if not REF_BINARY.exists():
        REF_BINARY.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["gcc", "-O2", "-o", str(REF_BINARY),
             "/root/reference/normalise_kmers_multi_large.c", "-lpthread"],
            check=True,
        )
    return REF_BINARY
