"""Test configuration.

Correctness tests run on CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4 implication notes;
the driver separately dry-runs the multichip path). Set APRIL_TEST_TPU=1 to
run on the real chip instead.
"""

import os

if os.environ.get("APRIL_TEST_TPU", "0") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
