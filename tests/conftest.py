"""Test harness config: CPU-only JAX with a virtual 8-device mesh.

Tests must not require TPU hardware (SURVEY.md §4.2): Pallas kernels run in
interpret mode, distributed tests fake an 8-device mesh on CPU. The host
environment force-registers a TPU platform via sitecustomize, so we both set
XLA_FLAGS before backend init and override jax_platforms at import.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: statistical BER tests (minutes)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m"):
        return
    skip_slow = pytest.mark.skip(reason="slow; run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def mackay_graph():
    from ecc_ldpc_tpu.codes import mackay_1008
    from ecc_ldpc_tpu.graph import compile_graph

    spec = mackay_1008()
    return spec, compile_graph(spec)
