"""Multi-chip (virtual 8-device CPU mesh) tests.

The comparisons run in a subprocess with a cleaned environment because the
axon sitecustomize locks XLA's device-count flags at interpreter start
(see conftest.py). sharding_driver.py does the actual work: the sharded
row-band frame must match the single-chip frame bit-for-bit (within f32
reassociation noise).
"""

import os
import subprocess
import sys

import jax
import pytest


def test_sharded_matches_single_chip():
    n = 8
    if len(jax.devices()) >= n:
        # environment already has enough devices — run in-process
        rc = _run_inproc(n)
        assert rc == 0
        return
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable axon sitecustomize
    env.pop("_TRTPU_TEST_REEXEC", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    driver = os.path.join(os.path.dirname(__file__), "sharding_driver.py")
    result = subprocess.run(
        [sys.executable, driver, str(n)],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    print(result.stdout)
    assert result.returncode == 0, (
        f"sharding driver failed (rc={result.returncode}):\n"
        f"{result.stdout}\n{result.stderr[-4000:]}"
    )


def _run_inproc(n):
    from tests.sharding_driver import main

    return main(n)
