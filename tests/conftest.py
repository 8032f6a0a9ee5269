import os

# Force CPU with 8 virtual devices so multi-chip sharding tests run anywhere.
# (The session env pins JAX_PLATFORMS=axon/TPU, so an unconditional override is
# required; on TPU the default bf16 matmul precision would break fp32 parity
# assertions.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# sitecustomize (axon) imports jax at interpreter startup, so jax already
# captured JAX_PLATFORMS=axon from the env; override via config instead.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the rollout/train-step graphs dominate suite
# wall time; entries are keyed per-platform so the CPU tests and the TPU
# bench can share the directory.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# persist EVERY compile: a tiny CLI train run issues dozens of sub-2s
# jits (zdict refresh, eval metrics, logging reductions) that otherwise
# recompile on every suite run — measured ~25% of fast-tier wall time
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
