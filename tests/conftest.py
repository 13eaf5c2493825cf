"""Test configuration.

Correctness tests run on CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multichip path; bench.py runs on the real chip). Set APRIL_TEST_TPU=1 to run
on the real chip instead.

Note: this machine's sitecustomize force-registers the 'axon' TPU platform and
sets JAX_PLATFORMS=axon before conftest runs, so the env var alone is not
enough — jax.config must be updated after import.
"""

import os

if os.environ.get("APRIL_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    """Regenerate gitignored golden fbank fixtures from the reference oracle
    (tools/gen_golden_fbank.py) when missing; skip silently if the reference
    tree is absent (the fixture-using tests will then fail loudly)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    try:
        from tools.gen_golden_fbank import ensure_goldens

        ensure_goldens()
    except FileNotFoundError:
        pass
    try:
        from tools.gen_golden_decode import ensure_goldens as ensure_decode

        ensure_decode()
    except FileNotFoundError:
        pass
