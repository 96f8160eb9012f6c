"""Tests of the RDKit adaptor via duck-typed molecule fakes.

RDKit is not installed in the test environment; ``_from_rdkit`` only
touches a narrow, documented API surface (atoms, bonds, ring info,
molblock export), so lightweight fakes exercise the full conversion —
including the ring-stereo inference path, with a fake ``rdkit.Chem``
module injected for the two functions that import it lazily.
"""
import sys
import types

import numpy as np
import pytest

from graphdot_tpu import Graph
from graphdot_tpu.graph._from_rdkit import (
    FunctionalGroup, _from_rdkit, get_atom_ring_stereo,
    get_bond_orientation_dict, get_ringlist
)


class FakeAtom:
    def __init__(self, mol, idx, z, charge=0, hcount=0, hybrid=3,
                 aromatic=False, chiral=0):
        self._mol = mol
        self._idx = idx
        self._z = z
        self._charge = charge
        self._hcount = hcount
        self._hybrid = hybrid
        self._aromatic = aromatic
        self._chiral = chiral

    def GetIdx(self):
        return self._idx

    def GetAtomicNum(self):
        return self._z

    def GetFormalCharge(self):
        return self._charge

    def GetTotalNumHs(self):
        return self._hcount

    def GetHybridization(self):
        return self._hybrid

    def GetIsAromatic(self):
        return self._aromatic

    def GetChiralTag(self):
        return self._chiral

    def IsInRing(self):
        return any(
            self._idx in ring for ring in self._mol._rings
        )

    def GetNeighbors(self):
        out = []
        for b in self._mol._bonds:
            if b._i == self._idx:
                out.append(self._mol._atoms[b._j])
            elif b._j == self._idx:
                out.append(self._mol._atoms[b._i])
        return out

    def GetBonds(self):
        return [
            b for b in self._mol._bonds
            if self._idx in (b._i, b._j)
        ]


_SINGLE = object()          # sentinel playing rdkit's BondType.SINGLE


class FakeBond:
    def __init__(self, mol, i, j, order=1.0, wedge=0, aromatic=False,
                 conjugated=False, stereo=0):
        self._mol = mol
        self._i, self._j = i, j
        self._order = order
        self.wedge = wedge
        self._aromatic = aromatic
        self._conjugated = conjugated
        self._stereo = stereo

    def GetBeginAtomIdx(self):
        return self._i

    def GetEndAtomIdx(self):
        return self._j

    def GetBeginAtom(self):
        return self._mol._atoms[self._i]

    def GetEndAtom(self):
        return self._mol._atoms[self._j]

    def GetBondTypeAsDouble(self):
        return self._order

    def GetBondType(self):
        return _SINGLE if self._order == 1.0 else self._order

    def GetIsAromatic(self):
        return self._aromatic

    def GetIsConjugated(self):
        return self._conjugated

    def GetStereo(self):
        return self._stereo


class FakeRingInfo:
    def __init__(self, rings):
        self._rings = rings

    def AtomRings(self):
        return self._rings


class FakeMol:
    def __init__(self, atoms, bonds, rings=()):
        self._atoms = [FakeAtom(self, i, **a) for i, a in enumerate(atoms)]
        self._bonds = [FakeBond(self, *b[:2], **b[2]) for b in bonds]
        self._rings = tuple(rings)

    def GetAtoms(self):
        return self._atoms

    def GetBonds(self):
        return self._bonds

    def GetNumAtoms(self):
        return len(self._atoms)

    def GetAtomWithIdx(self, i):
        return self._atoms[i]

    def GetBondBetweenAtoms(self, i, j):
        for b in self._bonds:
            if {b._i, b._j} == {i, j}:
                return b
        return None

    def GetRingInfo(self):
        return FakeRingInfo(self._rings)

    def molblock(self):
        """V2000-style bond block carrying the wedge flags."""
        lines = ['', '  fake', '',
                 f'{len(self._atoms):>3d}{len(self._bonds):>3d}'
                 '  0  0  0  0  0  0  0  0999 V2000']
        for _ in self._atoms:
            lines.append(
                '    0.0000    0.0000    0.0000 C   0  0  0  0  0')
        for b in self._bonds:
            order = int(b._order)
            lines.append(
                f'{b._i + 1:>3d}{b._j + 1:>3d}{order:>3d}{b.wedge:>3d}')
        lines.append('M  END')
        return '\n'.join(lines)


@pytest.fixture
def fake_rdkit(monkeypatch):
    """Install a minimal fake 'rdkit.Chem.AllChem' for the two functions
    that lazily import it (molblock export + BondType.SINGLE)."""
    allchem = types.SimpleNamespace(
        BondType=types.SimpleNamespace(SINGLE=_SINGLE),
        MolToMolBlock=lambda mol, **kw: mol.molblock(),
    )
    chem = types.ModuleType('rdkit.Chem')
    chem.AllChem = allchem
    rdkit = types.ModuleType('rdkit')
    rdkit.Chem = chem
    monkeypatch.setitem(sys.modules, 'rdkit', rdkit)
    monkeypatch.setitem(sys.modules, 'rdkit.Chem', chem)
    return allchem


def _ring_mol():
    """Cyclopentane with an 'up' methyl on atom 0 and a 'down' oxygen on
    atom 2."""
    C = dict(z=6, hcount=2)
    atoms = [C, C, C, C, C, dict(z=6, hcount=3), dict(z=8, hcount=1)]
    bonds = (
        [(i, (i + 1) % 5, {}) for i in range(5)]        # the ring
        + [(0, 5, dict(wedge=1)), (2, 6, dict(wedge=6))]
    )
    return FakeMol(atoms, bonds, rings=((0, 1, 2, 3, 4),))


def test_ringlist_and_featureset():
    mol = _ring_mol()
    rl = get_ringlist(mol)
    assert rl[:5] == [[5]] * 5 and rl[5:] == [[0], [0]]

    g = _from_rdkit(Graph, mol, title='ring', set_ring_stereo=False)
    assert len(g.nodes) == 7 and len(g.edges) == 7
    assert set(g.nodes.columns) >= {
        'atomic_number', 'charge', 'hcount', 'hybridization',
        'aromatic', 'chiral', 'ring_list', '!i'
    }
    assert set(g.edges.columns) >= {
        'order', 'aromatic', 'conjugated', 'stereo', '!i', '!j'
    }
    zs = np.asarray(g.nodes['atomic_number'])
    order = np.argsort(np.asarray(g.nodes['!i']))
    assert list(zs[order]) == [6, 6, 6, 6, 6, 6, 8]


def test_bond_orientation_and_ring_stereo(fake_rdkit):
    mol = _ring_mol()
    bod = get_bond_orientation_dict(mol)
    assert bod[(0, 5)] == 1 and bod[(2, 6)] == 6
    assert bod[(0, 1)] == 0          # plain ring bond parsed too

    ring = (0, 1, 2, 3, 4)
    updown = [
        get_atom_ring_stereo(mol, mol.GetAtomWithIdx(i), ring,
                             bond_orientation_dict=bod)
        for i in ring
    ]
    assert updown == [1, 0, -1, 0, 0]

    g = _from_rdkit(Graph, mol, title='ring')
    edges = {
        (int(i), int(j)): float(s) for i, j, s in zip(
            g.edges['!i'], g.edges['!j'], g.edges['ring_stereo']
        )
    }
    # up at 0, down at 2: bonds walking 0->2 get 1*(-1)/2, bonds
    # walking 2->0 the long way get (-1)*1/3
    assert edges[(0, 1)] == pytest.approx(-0.5)
    assert edges[(1, 2)] == pytest.approx(-0.5)
    assert edges[(2, 3)] == pytest.approx(-1 / 3)
    assert edges[(3, 4)] == pytest.approx(-1 / 3)
    assert edges[(0, 4)] == pytest.approx(-1 / 3)
    assert edges[(0, 5)] == 0 and edges[(2, 6)] == 0


def test_functional_group_ordering():
    mol = _ring_mol()
    a0 = mol.GetAtomWithIdx(0)
    fg_methyl = FunctionalGroup(mol, a0, mol.GetAtomWithIdx(5))
    fg_ring = FunctionalGroup(mol, a0, mol.GetAtomWithIdx(1))
    # the ring branch reaches the oxygen, so it outranks the methyl
    assert fg_ring > fg_methyl
    assert fg_methyl < fg_ring
    assert fg_methyl == FunctionalGroup(mol, a0, mol.GetAtomWithIdx(5))


def test_from_pymatgen_duck_type(monkeypatch):
    """_from_pymatgen delegates to the ASE path through pymatgen's
    adaptor; fake both to check the wiring."""
    sentinel_atoms = object()
    sentinel_graph = object()

    ase_mod = types.ModuleType('pymatgen.io.ase')
    ase_mod.AseAtomsAdaptor = types.SimpleNamespace(
        get_atoms=lambda molecule: sentinel_atoms
    )
    io_mod = types.ModuleType('pymatgen.io')
    io_mod.ase = ase_mod
    pmg = types.ModuleType('pymatgen')
    pmg.io = io_mod
    monkeypatch.setitem(sys.modules, 'pymatgen', pmg)
    monkeypatch.setitem(sys.modules, 'pymatgen.io', io_mod)
    monkeypatch.setitem(sys.modules, 'pymatgen.io.ase', ase_mod)

    seen = {}

    class FakeGraphCls:
        @classmethod
        def from_ase(cls, atoms, use_pbc, adjacency):
            seen.update(atoms=atoms, use_pbc=use_pbc,
                        adjacency=adjacency)
            return sentinel_graph

    from graphdot_tpu.graph._from_pymatgen import _from_pymatgen
    out = _from_pymatgen(FakeGraphCls, object(), use_pbc=False,
                         adjacency='default')
    assert out is sentinel_graph
    assert seen == {'atoms': sentinel_atoms, 'use_pbc': False,
                    'adjacency': 'default'}
