"""Unbiased device timing through a high-latency dispatch path.

The dev harness reaches the TPU through a tunnel with a ~20-45 ms
per-call round trip. Any "time one call" or "time a W-iteration scan
and divide by W" measurement therefore carries a +latency/W bias —
measured on this harness: a 10-build Gram scan reads 7.5 ms/build while
the true device cost is 5.1 ms (the same total wall time fits W = 10,
50, and 100 for a cheap body: the wall clock was ALL round trip).

``scan_device_time`` removes the constant by timing the same jitted
scan loop at two lengths and taking the slope:

    dt = (T(W2) - T(W1)) / (W2 - W1)

Both measurements are min-over-repeats (robust to latency spikes), and
each scan iteration perturbs the input so neither XLA nor a
result-caching tunnel can collapse the loop.
"""
import time

import numpy as np


def scan_device_time(fn, theta0, w1=10, w2=60, n_rep=7):
    """Per-iteration device time of ``fn(theta)`` (scalar- or
    array-returning; reduced to a scalar carry), measured as the slope
    of a compiled ``lax.scan`` between lengths ``w1`` and ``w2``.

    Returns (seconds_per_iteration, total_w2_seconds).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(t, dts):
        def body(carry, dt):
            out = fn(t + dt)
            return carry + jnp.sum(out), None
        s, _ = lax.scan(body, 0.0, dts)
        return s

    def timed(W):
        dts = jnp.asarray(1e-4 * np.arange(W), dtype=jnp.float32)
        loop(theta0, dts).block_until_ready()
        ts = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(theta0, dts))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    t1 = timed(w1)
    t2 = timed(w2)
    return max(t2 - t1, 1e-12) / (w2 - w1), t2
