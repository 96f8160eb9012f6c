#!/usr/bin/env python
"""Molecule Gram-build throughput scan (reference:
``example/perfbench/molecule-cookie-cutter.py``). Usage:
``python molecule-throughput.py -n_graphs=128 -n_atoms=24 -repeat=5``."""
import sys
import time

import numpy as np


def parse_args(argv, **defaults):
    opts = dict(defaults)
    for a in argv:
        if a.startswith('-') and '=' in a:
            k, v = a[1:].split('=', 1)
            opts[k] = type(defaults.get(k, str))(v)
    return opts


def main():
    import jax.numpy as jnp
    import jax

    from graphdot_tpu.inference import GramFactory
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_molecule_set

    opts = parse_args(
        sys.argv[1:], n_graphs=128, n_atoms=24, repeat=5
    )
    graphs = random_molecule_set(
        0, opts['n_graphs'], n_atoms_range=(9, opts['n_atoms'] + 1)
    )
    n_pairs = opts['n_graphs'] * (opts['n_graphs'] + 1) // 2

    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    )
    factory = GramFactory(kernel, graphs)
    theta0 = jnp.asarray(factory.theta0, dtype=jnp.float32)
    gram = jax.jit(factory.gram)

    t0 = time.perf_counter()
    gram(theta0).block_until_ready()
    t_first = time.perf_counter() - t0

    times = []
    for i in range(opts['repeat']):
        t0 = time.perf_counter()
        gram(theta0 + 1e-4 * i).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = np.median(times)

    print(f'first call (incl. compile): {t_first:.3f} s')
    print(f'steady state: {dt * 1e3:.1f} ms '
          f'({n_pairs / dt:,.0f} pairs/s)')


if __name__ == '__main__':
    main()
