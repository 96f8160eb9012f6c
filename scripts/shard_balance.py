"""Quantify load balance of the sharded Gram build (VERDICT r2 #9).

The sharded Gram partitions every size-class pair group's job list
uniformly over the mesh (each device works on every group), so the only
imbalance is the per-group padding remainder plus the padded-FLOP waste
of the size classes themselves. This script reports, for the
128-molecule bench workload: per-group job counts, the per-device
padded-FLOP share, and the resulting skew at several device counts.

Run: JAX_PLATFORMS=cpu python scripts/shard_balance.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from graphdot_tpu.inference import GramFactory
from graphdot_tpu.kernel import MarginalizedGraphKernel
from graphdot_tpu.microkernel import (
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.testing import random_molecule_set


def matvec_flops(ca, cb, m1, m2):
    """Edge-mode CG matvec cost of one padded (ca, cb) pair."""
    return 2 * (m1 * ca * cb + m1 * m2 * cb + ca * m1 * m2 + ca * m2 * cb)


def main():
    graphs = random_molecule_set(42, 128, n_atoms_range=(9, 24))
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    )
    factory = GramFactory(kernel, graphs, normalize=True)
    assert factory._groups is not None, 'expected a bucketed factory'

    rows = []
    for grp in factory._groups:
        ca, cb = grp['ca'], grp['cb']
        m1 = grp['batch1']['esrc'].shape[1]
        m2 = grp['batch2']['esrc'].shape[1]
        n_jobs = len(np.asarray(grp['idx1']))
        # effective CG iterations ~ the group's own cap in the worst
        # case; relative shares are what matter for balance
        cost = matvec_flops(ca, cb, m1, m2) * min(
            ca * cb, factory._maxiter_cap)
        rows.append((ca, cb, n_jobs, cost))

    total = sum(n * c for _, _, n, c in rows)
    print('group (ca x cb) | jobs | padded GFLOP/job | share of total')
    for ca, cb, n_jobs, cost in rows:
        print(f'  {ca:3d} x {cb:3d}   | {n_jobs:5d} | '
              f'{cost / 1e9:16.4f} | {100 * n_jobs * cost / total:6.2f}%')

    for n_dev in (4, 8, 16, 64):
        per_dev = np.zeros(n_dev)
        for _, _, n_jobs, cost in rows:
            padded = -(-n_jobs // n_dev)  # jobs per device after padding
            per_dev += padded * cost      # uniform: every device equal
            # remainder waste: (padded * n_dev - n_jobs) padded jobs
        # per_dev is uniform by construction; express skew vs the
        # zero-padding ideal
        ideal = total / n_dev
        skew = (per_dev.max() - ideal) / ideal
        print(f'n_dev={n_dev:3d}: per-device padded GFLOP='
              f'{per_dev.max() / 1e9:.3f}, ideal={ideal / 1e9:.3f}, '
              f'padding overhead={100 * skew:.2f}%')


if __name__ == '__main__':
    main()
