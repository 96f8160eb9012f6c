"""Adaptor for RDKit molecule objects (reference:
``graphdot/graph/_from_rdkit.py:215-280``).

Produces the same feature set as the reference:

- node features: atomic_number, charge, hcount, hybridization, aromatic,
  chiral, ring_list
- edge features: order (or type), aromatic, conjugated, stereo, ring_stereo

The ring-stereo inference (up/down orientation of ring substituents via
molblock wedge parsing and breadth-first functional-group comparison) is
re-implemented without the ``treelib`` dependency.
"""
import re

import networkx as nx
import numpy as np

from ._from_networkx import _from_networkx


class FunctionalGroup:
    """A functional group reachable from ``atom0`` through the directed bond
    ``atom0 -> atom1``, represented as a breadth-first layered tree used
    solely for canonical-rank comparison (reference ``_from_rdkit.py:12``).
    """

    def __init__(self, mol, atom0, atom1, depth=5):
        order0 = mol.GetBondBetweenAtoms(
            atom0.GetIdx(), atom1.GetIdx()
        ).GetBondTypeAsDouble()
        # each entry: (tag, atom, parent_idx); breadth-first expansion
        root = ([atom0.GetAtomicNum(), order0], atom0, None)
        first = ([atom1.GetAtomicNum(), order0], atom1, atom0.GetIdx())
        layers = [[root], [first]]
        for _ in range(depth):
            frontier = []
            for tag, atom, parent in layers[-1]:
                for nbr in atom.GetNeighbors():
                    if nbr.GetIdx() == parent:
                        continue
                    order = mol.GetBondBetweenAtoms(
                        nbr.GetIdx(), atom.GetIdx()
                    ).GetBondTypeAsDouble()
                    frontier.append((
                        [nbr.GetAtomicNum(), order], nbr, atom.GetIdx()
                    ))
            if not frontier:
                break
            layers.append(frontier)
        self._layers = layers

    def get_rank_list(self):
        rank = []
        for layer in self._layers:
            for tag, _, _ in sorted(layer, key=lambda t: t[0], reverse=True):
                rank += tag
        return rank

    def __eq__(self, other):
        return self.get_rank_list() == other.get_rank_list()

    def __lt__(self, other):
        return self.get_rank_list() < other.get_rank_list()

    def __gt__(self, other):
        return self.get_rank_list() > other.get_rank_list()


# V2000 bond-block lines: >= 4 right-aligned integer fields
# (begin atom, end atom, bond type, stereo flag). Atom lines contain
# float coordinates and the counts line ends in 'V2000', so neither can
# match. Divergence from the reference: its character-class pattern
# (``_from_rdkit.py:103``) cannot match a 12-character bond line, so its
# orientation dict is silently empty; the field-wise parse below actually
# recovers the wedge/hash flags.
_BOND_LINE = re.compile(
    r'^[ \t]*(\d+)[ \t]+(\d+)[ \t]+(\d+)[ \t]+(\d+)(?:[ \t]+\d+)*'
    r'[ \t]*$',
    re.MULTILINE
)


def get_bond_orientation_dict(mol):
    """Parse wedge/hash bond orientations out of a molblock."""
    from rdkit.Chem import AllChem as Chem
    bond_orientation_dict = {}
    mb = Chem.MolToMolBlock(mol, includeStereo=True, kekulize=False)
    for i, j, _, d in _BOND_LINE.findall(mb):
        i, j, d = int(i) - 1, int(j) - 1, int(d)
        i, j = min(i, j), max(i, j)
        bond_orientation_dict[(i, j)] = d
    return bond_orientation_dict


def get_atom_ring_stereo(mol, atom, ring_idx, depth=5,
                         bond_orientation_dict=None):
    """Determine whether an atom's larger substituent points up (+1), down
    (-1), or neither (0) relative to the ring plane."""
    from rdkit.Chem import AllChem as Chem

    if bond_orientation_dict is None:
        bond_orientation_dict = get_bond_orientation_dict(mol)

    up_atom = down_atom = None
    updown_tag = None
    if len(atom.GetNeighbors()) == 2:
        return 0
    if len(atom.GetNeighbors()) > 4:
        raise RuntimeError(
            'cannot deal with atom in a ring with more than 4 bonds'
        )
    for bond in atom.GetBonds():
        if bond.GetBondType() != Chem.BondType.SINGLE \
                and atom.GetAtomicNum() == 6:
            return 0
        i = bond.GetBeginAtom().GetIdx()
        j = bond.GetEndAtom().GetIdx()
        ij = (i, j)
        if i in ring_idx and j in ring_idx:
            if bond_orientation_dict.get(ij) != 0:
                updown_tag = bond_orientation_dict.get(ij)
            continue
        if bond_orientation_dict.get(ij) == 1:
            if up_atom is not None:
                raise RuntimeError('2 bonds oriented up')
            other = j if i == atom.GetIdx() else i
            up_atom = mol.GetAtomWithIdx(other)
        elif bond_orientation_dict.get(ij) == 6:
            if down_atom is not None:
                raise RuntimeError('2 bonds oriented down')
            other = j if i == atom.GetIdx() else i
            down_atom = mol.GetAtomWithIdx(other)
    if up_atom is None and down_atom is None:
        if updown_tag == 1:
            return 1
        elif updown_tag == 6:
            return -1
        else:
            return 0
    elif up_atom is None:
        return -1
    elif down_atom is None:
        return 1
    else:
        fg_up = FunctionalGroup(mol, atom, up_atom, depth)
        fg_down = FunctionalGroup(mol, atom, down_atom, depth)
        if fg_up > fg_down:
            return 1
        elif fg_up < fg_down:
            return -1
        else:
            return 0


def get_ringlist(mol):
    """Per-atom sorted list of sizes of rings the atom participates in
    ([0] for acyclic atoms)."""
    ringlist = [[] for _ in range(mol.GetNumAtoms())]
    for ring in mol.GetRingInfo().AtomRings():
        for i in ring:
            ringlist[i].append(len(ring))
    return [sorted(rings) if len(rings) else [0] for rings in ringlist]


def _from_rdkit(cls, mol, title=None, bond_type='order', set_ring_list=True,
                set_ring_stereo=True):
    g = nx.Graph(title=title)

    for i, atom in enumerate(mol.GetAtoms()):
        g.add_node(i)
        g.nodes[i]['atomic_number'] = atom.GetAtomicNum()
        g.nodes[i]['charge'] = atom.GetFormalCharge()
        g.nodes[i]['hcount'] = atom.GetTotalNumHs()
        g.nodes[i]['hybridization'] = atom.GetHybridization()
        g.nodes[i]['aromatic'] = atom.GetIsAromatic()
        g.nodes[i]['chiral'] = 0 if atom.IsInRing() else atom.GetChiralTag()

    if set_ring_list:
        for i, rings in enumerate(get_ringlist(mol)):
            g.nodes[i]['ring_list'] = rings

    for bond in mol.GetBonds():
        ij = (bond.GetBeginAtomIdx(), bond.GetEndAtomIdx())
        g.add_edge(*ij)
        if bond_type == 'order':
            g.edges[ij]['order'] = bond.GetBondTypeAsDouble()
        else:
            g.edges[ij]['type'] = bond.GetBondType()
        g.edges[ij]['aromatic'] = bond.GetIsAromatic()
        g.edges[ij]['conjugated'] = bond.GetIsConjugated()
        g.edges[ij]['stereo'] = bond.GetStereo()
        if set_ring_stereo is True:
            g.edges[ij]['ring_stereo'] = 0

    if set_ring_stereo is True:
        bond_orientation_dict = get_bond_orientation_dict(mol)
        for ring_idx in mol.GetRingInfo().AtomRings():
            atom_updown = []
            for idx in ring_idx:
                atom = mol.GetAtomWithIdx(idx)
                atom_updown.append(
                    get_atom_ring_stereo(
                        mol, atom, ring_idx, depth=5,
                        bond_orientation_dict=bond_orientation_dict
                    )
                )
            atom_updown = np.array(atom_updown)
            non_zero_index = np.where(atom_updown != 0)[0]
            for j in range(len(non_zero_index)):
                b = non_zero_index[j]
                if j == len(non_zero_index) - 1:
                    e = non_zero_index[0]
                    length = len(atom_updown) + e - b
                else:
                    e = non_zero_index[j + 1]
                    length = e - b
                stereo_of_ring_bond = atom_updown[b] * atom_updown[e] / length
                for k in range(length):
                    idx1 = (b + k) % len(ring_idx)
                    idx2 = (b + k + 1) % len(ring_idx)
                    ij = (ring_idx[idx1], ring_idx[idx2])
                    ij = (min(ij), max(ij))
                    g.edges[ij]['ring_stereo'] = stereo_of_ring_bond

    return _from_networkx(cls, g)
