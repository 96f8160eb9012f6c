"""Graph container and converters.

API parity with the reference ``graphdot/graph/__init__.py:40`` (Graph,
permute, adjacency_matrix, laplacian, has_unified_types, unify_datatype,
from_networkx/from_ase/from_pymatgen/from_rdkit/to_networkx), rebuilt for a
TPU-native pipeline: graphs are plain host-side column frames; the padded
struct-of-arrays device layout lives in :mod:`graphdot_tpu.graph.batch`
(the OctileGraph analogue) and is cached per graph in ``graph.cookie``.
"""
import copy as cp
import itertools as it
import warnings

import numpy as np
import scipy.sparse

from ..util.cookie import VolatileCookie
from .frame import DataFrame
from .typetool import common_min_type, _is_scalar_dtype
from ._from_networkx import _from_networkx
from ._to_networkx import _to_networkx

__all__ = ['Graph']


def _from_dict(d):
    if isinstance(d, DataFrame):
        return d
    else:
        return DataFrame(d)


class Graph:
    """Stores a graph as node and edge attribute frames.

    Parameters
    ----------
    nodes: dataframe
        each row represents a node; must contain column '!i'.
    edges: dataframe
        each row represents an edge; must contain columns '!i' and '!j',
        and optionally '!w' for edge weights.
    title: str
        a unique identifier of the graph.
    """

    def __init__(self, nodes, edges, title=''):
        self.title = str(title)
        self.nodes = _from_dict(nodes)
        self.edges = _from_dict(edges)
        assert '!i' in self.nodes
        assert '!i' in self.edges and '!j' in self.edges

    def __repr__(self):
        return '{}(nodes={}, edges={}, title={})'.format(
            type(self).__name__, repr(self.nodes), repr(self.edges),
            repr(self.title)
        )

    @property
    def cookie(self):
        try:
            return self.__cookie
        except AttributeError:
            self.__cookie = VolatileCookie()
            return self.__cookie

    def copy(self, deep=False):
        """Make a copy of an existing graph."""
        g = self.__class__(
            nodes=self.nodes.copy(deep=deep),
            edges=self.edges.copy(deep=deep),
            title=self.title
        )
        for key, val in self.__dict__.items():
            if key not in ['nodes', 'edges', 'title']:
                g.__dict__[key] = cp.deepcopy(val) if deep else val
        return g

    def permute(self, perm, inplace=False):
        """Rearrange the node indices of a graph by a permutation array."""
        if inplace:
            g = self
            self.cookie.clear()
        else:
            g = self.copy(deep=True)

        iperm = np.argsort(perm)
        g.nodes['!i'][:] = iperm[g.nodes['!i']]
        g.edges['!i'][:] = iperm[g.edges['!i']]
        g.edges['!j'][:] = iperm[g.edges['!j']]
        return g

    @property
    def adjacency_matrix(self):
        """The (weighted) adjacency matrix as a sparse matrix."""
        N = len(self.nodes)
        i = np.asarray(self.edges['!i'])
        j = np.asarray(self.edges['!j'])
        w = (np.asarray(self.edges['!w']) if '!w' in self.edges
             else np.ones_like(i))
        A = scipy.sparse.coo_matrix((w, (i, j)), shape=(N, N))
        return A + A.T

    @property
    def laplacian(self):
        """The graph Laplacian as a sparse matrix."""
        A = self.adjacency_matrix
        D = np.asarray(A.sum(axis=0)).flatten()
        return scipy.sparse.diags(D, 0) - A

    @staticmethod
    def has_unified_types(graphs):
        """Check if all graphs have the same set of nodal/edge features."""
        first = next(iter(graphs))
        node_t = first.nodes.rowtype()
        edge_t = first.edges.rowtype()
        for second in graphs:
            if second.nodes.rowtype() != node_t:
                return ('nodes', first, second)
            elif second.edges.rowtype() != edge_t:
                return ('edges', first, second)
        return True

    @classmethod
    def unify_datatype(cls, graphs, inplace=False):
        """Ensure that each attribute has the same data type across graphs."""
        for g in graphs:
            g.cookie.clear()
        if inplace is not True:
            graphs = [g.copy(deep=False) for g in graphs]

        features = {}
        for component in ['nodes', 'edges']:
            first = None
            for g in graphs:
                second = set(getattr(g, component).columns)
                first = first or second
                if second != first:
                    raise TypeError(
                        f'Graph {g} with node features {second} '
                        'does not match with the other graphs.'
                    )
            features[component] = first

        for component in ['nodes', 'edges']:
            group = [getattr(g, component) for g in graphs]
            for key in features[component]:
                types = [g[key].concrete_type for g in group]
                t = common_min_type.of_types(types)
                if t is None:
                    t = common_min_type.of_types(types, coerce=False)
                if t is None:
                    raise TypeError(
                        f'Cannot unify attribute {key} containing mixed '
                        'object types'
                    )
                if _is_scalar_dtype(t):
                    for g in group:
                        g[key] = g[key].astype(t)
                elif t in [list, tuple, np.ndarray]:
                    t_sub = common_min_type.of_values(
                        it.chain.from_iterable(
                            it.chain.from_iterable([g[key] for g in group])
                        )
                    )
                    if t_sub is None:
                        raise TypeError(
                            f'Cannot find a common type for elements in '
                            f'{key}.'
                        )
                    for g in group:
                        g[key] = [np.array(seq, dtype=t_sub) for seq in
                                  g[key]]

        if inplace is not True:
            return graphs

    @classmethod
    def from_networkx(cls, graph, weight=None):
        """Convert from a NetworkX ``Graph``."""
        return _from_networkx(cls, graph, weight)

    @classmethod
    def from_ase(cls, atoms, adjacency='default', use_charge=False,
                 use_pbc=True):
        """Convert from ASE atoms to a molecular graph."""
        from ._from_ase import _from_ase
        return _from_ase(cls, atoms, adjacency, use_charge, use_pbc)

    @classmethod
    def from_pymatgen(cls, molecule, use_pbc=True, adjacency='default'):
        """Convert from a pymatgen molecule to a molecular graph."""
        from ._from_pymatgen import _from_pymatgen
        return _from_pymatgen(cls, molecule, use_pbc, adjacency)

    @classmethod
    def from_smiles(cls, smiles):
        """DEPRECATED and replaced by from_rdkit."""
        raise RuntimeError(
            'from_smiles has been removed, use from_rdkit instead.'
        )

    @classmethod
    def from_rdkit(cls, mol, title=None, bond_type='order',
                   set_ring_list=True, set_ring_stereo=True):
        """Convert an RDKit molecule to a graph."""
        from ._from_rdkit import _from_rdkit
        return _from_rdkit(cls, mol, title=title, bond_type=bond_type,
                           set_ring_list=set_ring_list,
                           set_ring_stereo=set_ring_stereo)

    def to_networkx(self):
        """Convert the graph to a NetworkX ``Graph``, copying node and edge
        attributes."""
        return _to_networkx(self)
