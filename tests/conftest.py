"""Test configuration: run JAX on a virtual 8-device CPU mesh so that both
numerics and multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4.8)."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()
