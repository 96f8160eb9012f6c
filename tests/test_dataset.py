"""Dataset loader tests (network-dependent parts are skipped offline;
reference strategy: ``test/dataset/``)."""
import numpy as np
import pytest

from graphdot_tpu.dataset._atoms import SimpleAtoms, make_atoms


def _online():
    import socket
    try:
        socket.create_connection(('quantum-machine.org', 80), timeout=3)
        return True
    except OSError:
        return False


def test_simple_atoms():
    a = SimpleAtoms([6, 1, 1, 1, 1], np.random.rand(5, 3))
    assert len(a) == 5
    assert a.get_atomic_numbers().tolist() == [6, 1, 1, 1, 1]
    assert a.get_positions().shape == (5, 3)
    assert a.get_chemical_formula() == 'C H4'.replace(' ', '')
    assert not a.pbc.any()


def test_make_atoms_fallback():
    a = make_atoms([8, 1], [[0, 0, 0], [1, 0, 0]], charges=[0.1, -0.1])
    assert len(a) == 2
    assert np.allclose(a.get_initial_charges(), [0.1, -0.1])


@pytest.mark.skipif(not _online(), reason='no network access')
def test_qm7_download(tmp_path):
    from graphdot_tpu.dataset import QM7
    qm7 = QM7(local_filename=str(tmp_path / 'qm7.mat'), ase=True)
    assert len(qm7) == 7165
    assert 'atomization_energy' in qm7.columns
    from graphdot_tpu import Graph
    g = Graph.from_ase(qm7.atoms.iloc[0])
    assert len(g.nodes) > 0


def test_qm7_parses_offline(tmp_path):
    """QM7 loader parses a synthetic qm7.mat fixture (no network)."""
    import numpy as np
    import scipy.io
    from graphdot_tpu.dataset import QM7

    n = 10
    rng = np.random.default_rng(0)
    Z = np.zeros((n, 23))
    R = np.zeros((n, 23, 3))
    for i in range(n):
        na = rng.integers(3, 8)
        Z[i, :na] = rng.choice([1, 6, 7, 8], size=na)
        R[i, :na] = rng.normal(size=(na, 3))
    mat = {
        'X': rng.normal(size=(n, 23, 23)),
        'T': rng.normal(size=(1, n)) * 100,
        'Z': Z,
        'R': R,
        'P': np.arange(n).reshape(5, 2),
    }
    f = tmp_path / 'qm7.mat'
    scipy.io.savemat(f, mat)

    qm7 = QM7(local_filename=str(f), ase=True)
    assert len(qm7) == n
    assert set(qm7.columns) >= {
        'coulomb_matrix', 'atomization_energy', 'atomic_charge', 'xyz',
        'split', 'atoms'
    }
    assert sorted(qm7.split.unique()) == [0, 1, 2, 3, 4]
    atoms = qm7.atoms[0]
    assert len(atoms) == int((Z[0] != 0).sum())
    # graph conversion consumes these Atoms (numbers + positions)
    assert atoms.get_atomic_numbers().min() >= 1
    assert atoms.get_positions().shape == (len(atoms), 3)


def test_qm9_parses_offline(tmp_path):
    """QM9 loader parses a synthetic dsgdb9nsd-style tar.bz2 fixture."""
    import tarfile
    import io
    from graphdot_tpu.dataset import QM9

    def xyz_entry(idx, symbols, coords, charges):
        lines = [str(len(symbols))]
        props = ['gdb', str(idx)] + [f'{v:.6f}' for v in range(1, 16)]
        lines.append('\t'.join(props))
        for s, (x, y, z), c in zip(symbols, coords, charges):
            lines.append(f'{s}\t{x:.4f}\t{y:.4f}\t{z:.4f}\t{c:.4f}')
        lines.append('\t'.join(['100.0'] * 3))          # frequencies
        lines.append('C\tC')                            # smiles
        lines.append('InChI=1S/x\tInChI=1S/x')          # inchi
        return '\n'.join(lines) + '\n'

    f = tmp_path / 'qm9.tar.bz2'
    with tarfile.open(f, 'w:bz2') as tf:
        for idx, (syms, n) in enumerate(
                [(['C', 'H', 'H', 'H', 'H'], 5), (['O', 'H', 'H'], 3)]):
            content = xyz_entry(
                idx + 1, syms,
                [(0.1 * k, 0.2 * k, 0.3 * k) for k in range(n)],
                # the '*^' exponent quirk of the raw files
                [-0.1] * n,
            ).replace('e-01', '*^-01')
            raw = content.encode()
            info = tarfile.TarInfo(f'dsgdb9nsd_{idx + 1:06d}.xyz')
            info.size = len(raw)
            tf.addfile(info, io.BytesIO(raw))

    qm9 = QM9(local_filename=str(f))
    assert len(qm9) == 2
    assert list(qm9.id) == [1, 2]
    assert qm9.symbols[0] == ('C', 'H', 'H', 'H', 'H')
    assert len(qm9.xyz[1]) == 3
    assert qm9.smiles_gdb[0] == 'C'


def test_metlin_and_ames_parse_offline(tmp_path):
    """METLIN_SMRT / AMES loaders parse local CSV fixtures."""
    from graphdot_tpu.dataset import AMES, METLIN_SMRT

    smrt = tmp_path / 'smrt.csv'
    smrt.write_text('pubchem;inchi;rt\n1;InChI=1S/x;120.5\n'
                    '2;InChI=1S/y;98.1\n')
    df = METLIN_SMRT(local_filename=str(smrt))
    assert list(df.columns) == ['pubchem', 'inchi', 'rt']
    assert len(df) == 2 and df.rt[0] == 120.5

    ames = tmp_path / 'ames.csv'
    ames.write_text('smiles,label\nC1=CC=CC=C1,1\nCCO,0\n')
    df = AMES(local_filename=str(ames))
    assert len(df) == 2 and list(df.label) == [1, 0]
