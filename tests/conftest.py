"""Test harness configuration (SURVEY.md §5).

Tests run on CPU by default with 8 forced host devices so mesh/collective
code paths (shard_map, psum, ppermute) execute exactly as on a pod slice
(SURVEY.md §5.4).  Set QTPU_TEST_TPU=1 to run the TPU-marked hardware-parity
tests on the real chip instead (slow first compile).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NOTE: `import pytest` already imports jax via a site plugin, so environment
# variables are too late here — use jax.config, which applies as long as the
# backend hasn't initialized yet.
if os.environ.get("QTPU_TEST_TPU", "0") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware (QTPU_TEST_TPU=1)")
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    on_tpu = os.environ.get("QTPU_TEST_TPU", "0") == "1"
    skip_tpu = pytest.mark.skip(reason="set QTPU_TEST_TPU=1 to run on hardware")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
