"""Test config: force a virtual 8-device CPU platform BEFORE jax imports
so sharding tests run anywhere (the driver validates real-TPU paths
separately via __graft_entry__)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The runtime image's sitecustomize imports jax at interpreter start (with
# JAX_PLATFORMS=axon), so jax.config captured the env before this file ran;
# update the already-imported config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_blobs(rng, n, d, n_clusters=32, scale=0.15):
    """Synthetic clustered corpus — SIFT-like geometry for ANN tests."""
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    x = centers[assign] + scale * rng.normal(size=(n, d)).astype(np.float32)
    return x.astype(np.float32)


@pytest.fixture(scope="session")
def corpus_small(rng):
    return make_blobs(rng, 2000, 32)


@pytest.fixture(scope="session")
def corpus_medium(rng):
    return make_blobs(rng, 20000, 64, n_clusters=64)
