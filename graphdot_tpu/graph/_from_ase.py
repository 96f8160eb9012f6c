"""Adaptor for ASE Atoms objects (reference:
``graphdot/graph/_from_ase.py:12``).

ASE itself is an optional dependency: this module only uses the documented
``Atoms`` duck-type interface (get_positions / get_atomic_numbers / cell /
pbc), so any object implementing it works.
"""
from itertools import product
import uuid

import numpy as np
from scipy.spatial import cKDTree

from .adjacency.atomic import AtomicAdjacency
from .frame import DataFrame


def _from_ase(cls, atoms, adjacency='default', use_charge=False,
              use_pbc=True):
    """Convert ASE atoms to a molecular graph where atoms become nodes and
    short-range interatomic interactions become edges."""
    if adjacency == 'default':
        adjacency = AtomicAdjacency()

    numbers = np.asarray(atoms.get_atomic_numbers())

    nodes = DataFrame({'!i': range(len(atoms))})
    nodes['element'] = numbers.astype(np.int8)
    if use_charge:
        nodes['charge'] = np.asarray(
            atoms.get_initial_charges()
        ).astype(np.float32)

    pbc = np.logical_and(np.asarray(atoms.pbc), use_pbc)
    cell = np.asarray(atoms.cell)
    images = [(cell.T * image).sum(axis=1) for image in product(
        *tuple([-1, 0, 1] if p else [0] for p in pbc))]
    x = np.asarray(atoms.get_positions())
    x_images = np.vstack([x + i for i in images])
    j_images = list(range(len(atoms))) * len(images)

    cutoff = adjacency.cutoff(numbers)
    nl = cKDTree(x).sparse_distance_matrix(cKDTree(x_images), cutoff)

    edgedict = {}
    for (i, j), r in nl.items():
        j = j_images[j]
        if j > i:
            w = adjacency(numbers[i], numbers[j], r)
            if w > 0 and ((i, j) not in edgedict or edgedict[(i, j)][1] > r):
                edgedict[(i, j)] = (w, r)
    if not edgedict:
        raise RuntimeError('Molecule has no bonds within the cutoff.')
    i, j, w, r = list(zip(*[(i, j, w, r)
                            for (i, j), (w, r) in edgedict.items()]))

    edges = DataFrame({
        '!i': np.array(i, dtype=np.uint32),
        '!j': np.array(j, dtype=np.uint32),
        '!w': np.array(w, dtype=np.float32),
        'length': np.array(r, dtype=np.float32),
    })

    try:
        formula = atoms.get_chemical_formula()
    except Exception:
        formula = ''
    return cls(nodes, edges, title='Molecule {formula} {id}'.format(
        formula=formula, id=uuid.uuid4().hex))
