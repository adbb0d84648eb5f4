"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip logic is tested the TPU-native way (SURVEY.md §4): the CPU backend
with ``xla_force_host_platform_device_count=8`` fakes an 8-device mesh so
sharding/collective code paths compile and execute without TPU hardware.
Env vars must be set before the first ``import jax`` anywhere.
"""

import os

# Force CPU even when the environment presets JAX_PLATFORMS (e.g. a TPU
# plugin registered from sitecustomize); override with
# SCD_TEST_PLATFORM=axon to run the suite on the real chip (the hardware
# platform is named "axon", not "tpu", in this environment).
_platform = os.environ.get("SCD_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A PJRT plugin may have already pinned jax_platforms before this file ran;
# config.update wins as long as the backend is not yet initialized.
jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_blobs(n_samples=500, n_features=2, centers=4, cluster_std=1.0, seed=1):
    """Deterministic gaussian blobs (the reference's fixture pattern,
    ``sskm_constrained.py:358-412`` uses sklearn make_blobs)."""
    from sklearn.datasets import make_blobs as _mb

    X, y = _mb(n_samples=n_samples, n_features=n_features, centers=centers,
               cluster_std=cluster_std, center_box=(-10.0, 10.0),
               shuffle=True, random_state=seed)
    return X.astype(np.float32), y


@pytest.fixture
def blobs():
    return make_blobs()
