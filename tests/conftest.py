"""Test configuration: run JAX on a virtual 8-device CPU mesh so that both
numerics and multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4.8).

Note: the environment may export JAX_PLATFORMS=axon (the TPU tunnel), and
jax merges rather than replaces it, so the config API is used to force the
CPU backend deterministically.
"""
import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
