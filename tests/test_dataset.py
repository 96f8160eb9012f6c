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
