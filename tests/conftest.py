"""Test configuration.

Regular tests run on ONE CPU device: forcing 8 virtual CPU devices makes XLA's
threefry lowering pathologically slow to compile (~100s for a trivial sampler
graph). Multi-device sharding tests instead spawn a subprocess with
XLA_FLAGS=--xla_force_host_platform_device_count=8 and JAX_DEFAULT_PRNG_IMPL=rbg
(see tests/test_sharding.py), matching how the driver validates
__graft_entry__.dryrun_multichip.
"""

import os
import sys

# NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
# image; jax.config is the reliable switch.
import jax

jax.config.update("jax_platforms",
                  os.environ.get("RECBOLE_TPU_TEST_PLATFORM", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from tests.synth_data import make_synthetic_dataset


@pytest.fixture(scope="session")
def synth_dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_dataset(str(root), name="synth")
    return str(root)
