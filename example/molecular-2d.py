#!/usr/bin/env python
"""2D molecular graphs from RDKit + GPR with a NUTS posterior over kernel
hyperparameters (reference: ``example/molecular-2d.py``, extended with the
Bayesian layer per BASELINE.json). Requires rdkit; falls back to synthetic
molecule graphs when unavailable."""
import numpy as np
import jax
import jax.numpy as jnp

from graphdot_tpu import Graph
from graphdot_tpu.inference import GPRLogProb, sample, split_rhat
from graphdot_tpu.kernel import MarginalizedGraphKernel
from graphdot_tpu.microkernel import (
    Constant, Convolution, KroneckerDelta, SquareExponential, TensorProduct
)

try:
    from rdkit import Chem
    smiles = ['CC', 'CCO', 'CCN', 'c1ccccc1', 'CC(=O)O', 'CCC', 'CO',
              'C=O']
    graphs = Graph.unify_datatype([
        Graph.from_rdkit(Chem.MolFromSmiles(s)) for s in smiles
    ])
    knode = TensorProduct(
        atomic_number=KroneckerDelta(0.8),
        aromatic=KroneckerDelta(0.8),
        charge=SquareExponential(1.0) + 0.01,
        hcount=SquareExponential(2.0) + 0.01,
        ring_list=Convolution(KroneckerDelta(0.5)),
    )
    kedge = TensorProduct(
        order=KroneckerDelta(0.8),
        aromatic=KroneckerDelta(0.8),
    )
except ImportError:
    print('rdkit unavailable; using synthetic molecule graphs')
    from graphdot_tpu.testing import random_molecule_set
    graphs = random_molecule_set(0, 8, n_atoms_range=(5, 10))
    knode = TensorProduct(element=KroneckerDelta(0.5))
    kedge = TensorProduct(length=SquareExponential(0.3) + 0.01)

rng = np.random.default_rng(0)
y = rng.normal(size=len(graphs))

kernel = MarginalizedGraphKernel(knode, kedge, q=0.05)
logprob = GPRLogProb(kernel, graphs, y, alpha=1e-2)

out = sample(
    logprob, jax.random.PRNGKey(0), n_chains=2, n_warmup=100,
    n_samples=100, init=jnp.asarray(logprob.theta0, dtype=jnp.float32),
    max_depth=6, init_jitter=0.1
)
s = np.asarray(out['samples'])
print('posterior mean of log-theta:', s.reshape(-1, s.shape[-1]).mean(0))
print('posterior std of log-theta: ', s.reshape(-1, s.shape[-1]).std(0))
print('split-Rhat:', split_rhat(out['samples']))
