"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the JAX-native answer to 'test distributed
without a cluster'). This environment preloads jax at interpreter startup
(site customization) with JAX_PLATFORMS=axon pointing at the real TPU chip,
so env vars are too late — jax.config.update before first backend use is the
reliable switch.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
