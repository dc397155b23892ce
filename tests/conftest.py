"""Test config: force CPU with a virtual 8-device mesh.

The sandbox pins JAX_PLATFORMS=axon (real TPU) via sitecustomize, so env vars
are not enough — we must flip the platform via jax.config before any backend
is initialized. All tests run on CPU; bench.py / __graft_entry__.py use the
real chip.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
