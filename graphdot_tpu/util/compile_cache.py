"""Persistent XLA/Mosaic compilation cache helper.

First-time compilation of the fused Pallas PCG kernels and the compiled
sampler loops is expensive (30 s - several minutes); enabling the
persistent cache makes every later process start warm. The reference
achieves the same effect with its source-keyed NVCC module cache
(``graphdot/kernel/marginalized/_backend_cuda.py:141-155``); here the
cache key is the XLA computation fingerprint, managed by JAX itself.
"""
import os


def enable_compilation_cache(path=None, min_compile_secs=1.0):
    """Enable JAX's on-disk compilation cache.

    Parameters
    ----------
    path: cache directory (created if missing). Defaults to
        ``$GRAPHDOT_TPU_CACHE`` or ``~/.cache/graphdot_tpu/xla``.
    min_compile_secs: only persist programs that took at least this long
        to compile (keeps the cache free of trivial entries).

    Safe to call more than once; returns the cache directory in use.
    """
    import jax

    if path is None:
        path = os.environ.get(
            'GRAPHDOT_TPU_CACHE',
            os.path.join(
                os.path.expanduser('~'), '.cache', 'graphdot_tpu', 'xla'
            )
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update(
        'jax_persistent_cache_min_compile_time_secs',
        float(min_compile_secs)
    )
    return path
