"""QM7 dataset loader (reference: ``graphdot/dataset/qm7.py:10``)."""
import numpy as np
import pandas as pd
import scipy.io

from ._atoms import make_atoms
from ._get import get


def QM7(download_url='http://quantum-machine.org/data/qm7.mat',
        local_filename='qm7.mat', overwrite=False, ase=False):
    """A 7165-molecule subset of GDB-13: up to 23 atoms / 7 heavy atoms,
    with PBE0 atomization energies.

    Parameters
    ----------
    ase: bool
        If True, add an 'atoms' column of Atoms objects (real ase.Atoms
        when ASE is installed, a compatible lightweight shim otherwise).

    Returns
    -------
    pandas.DataFrame with columns coulomb_matrix, atomization_energy,
    atomic_charge, xyz, split (and optionally atoms).
    """
    try:
        mat = scipy.io.loadmat(
            get(download_url, local_filename, overwrite=overwrite)
        )
    except Exception as e:
        raise RuntimeError(
            f'Loading {local_filename} failed due to error: {e}.'
        )

    def _as_objects(array):
        out = np.empty(len(array), dtype=object)
        for i, element in enumerate(array):
            out[i] = element
        return out

    qm7 = pd.DataFrame(data=dict(
        coulomb_matrix=_as_objects(mat['X']),
        atomization_energy=mat['T'].ravel().astype(float),
        atomic_charge=_as_objects(mat['Z']),
        xyz=_as_objects(mat['R']),
        split=np.zeros(7165, dtype=int)
    ))

    for i, s in enumerate(mat['P']):
        qm7.loc[s, 'split'] = i

    if ase is True:
        qm7['atoms'] = qm7.apply(
            lambda row: make_atoms(
                row.atomic_charge[row.atomic_charge != 0],
                row.xyz[row.atomic_charge != 0]
            ),
            axis=1
        )

    return qm7
