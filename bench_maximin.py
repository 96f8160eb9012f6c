#!/usr/bin/env python
"""Benchmark: MaxiMin graph-distance matrix throughput.

Workload mirrors the reference's MaxiMin use case
(``graphdot/metric/maximin/_maximin.py`` + ``_backend.cu:40-408``; used
by the active-learning / metric examples): the full pairwise distance
matrix over a batch of molecule-like graphs, where each entry is a
maximin reduction over the nodal similarity matrix the solver returns.

Prints one JSON line with graph-pairs/s (the reduction is host-side
numpy over device-built nodal Grams; the Gram build dominates).
"""
import json
import time

import numpy as np


def main(n_graphs=128, reps=3):
    from graphdot_tpu.util import enable_compilation_cache
    enable_compilation_cache()

    from graphdot_tpu.metric import MaxiMin
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_molecule_set

    graphs = random_molecule_set(11, n_graphs, n_atoms_range=(9, 24))
    metric = MaxiMin(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    )
    n_pairs = n_graphs * (n_graphs + 1) // 2

    D = metric(graphs)  # warm up / compile
    assert D.shape == (n_graphs, n_graphs)
    # the solver's float32 CG tolerance (~1e-6 in k) appears as ~sqrt
    # of that in the induced distance, so the self-distance floor is ~1e-3
    assert np.all(np.isfinite(D)) and np.allclose(np.diag(D), 0, atol=5e-3)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        metric(graphs)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # gradient-path timing (hotspot-restricted analytic gradient)
    t0 = time.perf_counter()
    _, dD = metric(graphs, eval_gradient=True)
    dt_grad = time.perf_counter() - t0
    assert np.all(np.isfinite(dD))

    print(json.dumps({
        'metric': f'MaxiMin distance matrix ({n_graphs} molecules)',
        'value': round(n_pairs / dt, 1),
        'unit': 'graph-pairs/s',
        'details': {
            'ms_per_matrix': round(dt * 1e3, 1),
            'ms_per_matrix_with_gradient': round(dt_grad * 1e3, 1),
            'n_pairs': n_pairs,
        },
    }))


if __name__ == '__main__':
    main()
