#!/usr/bin/env python
"""On-device numerics gate for the fused Pallas PCG solver.

Asserts pallas-vs-edge Gram agreement on the real TPU chip in all three
precision modes of the fused kernel ('split2', 'default', 'highest') —
interpret-mode tests in CI cannot catch a hardware-only drift in the
split-operand scheme. Run by hand (or from the verify skill) after any
change to ops/pallas_pcg.py or the solver:

    /opt/venv/bin/python scripts/verify_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from graphdot_tpu.util import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np                             # noqa: E402
import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402

# pallas-vs-edge agreement gates per precision mode: split2 is ~f32 via
# the exact-bf16 one-hot split; 'default' is single-pass bf16 (~3
# significant digits); 'highest' is the 6-pass f32-exact decomposition
_GATES = {'split2': 1e-4, 'default': 3e-2, 'highest': 1e-4}


def main():
    from graphdot_tpu.inference import GramFactory
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_molecule_set
    from graphdot_tpu.kernel.marginalized import _solver

    assert jax.default_backend() == 'tpu', (
        f'this gate needs the real chip, got {jax.default_backend()!r}'
    )

    graphs = random_molecule_set(11, 32, n_atoms_range=(9, 24))

    def gram_with(backend):
        kernel = MarginalizedGraphKernel(
            TensorProduct(element=KroneckerDelta(0.2)),
            TensorProduct(length=SquareExponential(0.3)),
            q=0.05, backend=backend,
        )
        factory = GramFactory(kernel, graphs, normalize=True)
        theta0 = jnp.asarray(factory.theta0, dtype=jnp.float32)
        return np.asarray(jax.jit(factory.gram)(theta0))

    K_edge = gram_with('edge')
    failures = []
    # _solver maps its f32 precision setting onto the pallas kernel mode;
    # drive each mode through the public backend path
    mode_by_precision = {
        'default': 'default', 'high': 'split2', 'highest': 'highest'
    }
    for precision, mode in mode_by_precision.items():
        _solver.set_solver_precision(precision)
        try:
            K_pallas = gram_with('pallas')
        finally:
            _solver.set_solver_precision('high')
        drift = float(np.max(np.abs(K_pallas - K_edge)))
        gate = _GATES[mode]
        status = 'ok' if drift <= gate else 'FAIL'
        print(f'mode={mode:8s} drift={drift:.3g}  gate={gate:g}  '
              f'[{status}]')
        if drift > gate:
            failures.append((mode, drift))

    if failures:
        raise SystemExit(f'numerics gate failed: {failures}')
    print('all precision modes within gates')

    # nodal + gradient traits through the fused kernel, on device
    small = random_molecule_set(3, 8, n_atoms_range=(6, 12))

    def nodal_grad(backend):
        k = MarginalizedGraphKernel(
            TensorProduct(element=KroneckerDelta(0.2)),
            TensorProduct(length=SquareExponential(0.3)),
            q=0.05, backend=backend,
        )
        return k(small, eval_gradient=True, nodal=True)

    Re, dRe = nodal_grad('edge')
    Rp, dRp = nodal_grad('pallas')
    dv = float(np.max(np.abs(Rp - Re)))
    dg = float(np.max(np.abs(dRp - dRe)))
    print(f'nodal+grad drift: value={dv:.3g} grad={dg:.3g}')
    assert dv <= 1e-4 and dg <= 1e-2, (dv, dg)
    print('nodal/gradient gate ok')


if __name__ == '__main__':
    main()
