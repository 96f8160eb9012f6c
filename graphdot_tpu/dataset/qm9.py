"""QM9 dataset loader (reference: ``graphdot/dataset/qm9.py:12``)."""
import io
import tarfile

import numpy as np
import pandas as pd

from ._get import get

_COLUMNS = [
    'id', 'A', 'B', 'C', 'mu', 'alpha', 'e_HOMO', 'e_LUMO', 'e_gap',
    'R2', 'zpve', 'U0', 'U', 'H', 'G', 'Cv', 'symbols', 'xyz',
    'charges_mulliken', 'freq', 'smiles_gdb', 'smiles_opt',
    'inchi_gdb', 'inchi_opt'
]


def QM9(download_url='https://ndownloader.figshare.com/files/3195389',
        local_filename='dsgdb9nsd.xyz.tar.bz2', overwrite=False,
        ase=False):
    """Quantum chemistry structures and properties of ~134k molecules
    (Ramakrishnan et al., Scientific Data 2014)."""
    try:
        f = get(download_url, local_filename, overwrite=overwrite)
    except Exception as e:
        raise RuntimeError(
            f'Acquiring {local_filename} failed due to error: {e}.'
        )

    data = []
    tf = tarfile.open(f, 'r:bz2')
    for xyz in tf:
        content = io.TextIOWrapper(tf.extractfile(xyz)).read()
        content = content.replace('*^', 'E')
        lines = content.split('\n')
        n_atoms = int(lines[0])
        fields = lines[1][4:].strip().split('\t')
        symbols, x, y, z, charges = zip(*[
            line.split('\t') for line in lines[2:n_atoms + 2]
        ])
        data.append(tuple(
            [int(fields[0])] + [float(w) for w in fields[1:]]
            + [symbols, np.array([x, y, z], dtype=float).T.tolist(),
               charges]
            + [list(map(float, lines[n_atoms + 2].strip().split('\t')))]
            + lines[n_atoms + 3].strip().split('\t')
            + lines[n_atoms + 4].strip().split('\t')
        ))

    qm9 = pd.DataFrame(data, columns=_COLUMNS)

    if ase is True:
        from ase import Atoms
        qm9['atoms'] = qm9.apply(
            lambda row: Atoms(
                symbols=row.symbols,
                positions=row.xyz,
                charges=row.charges_mulliken
            ),
            axis=1
        )

    return qm9
