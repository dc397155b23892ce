"""Test config: force CPU with a virtual 8-device mesh.

The sandbox pins JAX_PLATFORMS=axon (real TPU) via sitecustomize, so env vars
are not enough — we must flip the platform via jax.config before any backend
is initialized. All tests run on CPU; bench.py / __graft_entry__.py use the
real chip.
"""
import os

import jax

# XLA:CPU's collective rendezvous watchdog SIGABRTs the process when any
# virtual-device thread is starved >40 s between collectives — routine when
# 8 device threads share the sandbox's single core (see __graft_entry__.py).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    + " --xla_cpu_collective_timeout_seconds=3600").strip()

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
