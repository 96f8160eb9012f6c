"""Adaptor for pymatgen Molecule objects (reference:
``graphdot/graph/_from_pymatgen.py``)."""


def _from_pymatgen(cls, molecule, use_pbc=True, adjacency='default'):
    """Convert a pymatgen molecule to a molecular graph via the ASE path."""
    import pymatgen.io.ase
    atoms = pymatgen.io.ase.AseAtomsAdaptor.get_atoms(molecule)
    return cls.from_ase(atoms, use_pbc, adjacency)
