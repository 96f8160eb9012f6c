"""Generate the committed offline QM7-surrogate fixture.

The true QM7 archive (quantum-machine.org/data/qm7.mat) is unreachable
from this environment (no network egress), so the north-star parity
harness runs on a *surrogate* with the same shape as QM7: up to 7 heavy
atoms from {C, N, O, S} plus saturating hydrogens, valence-correct
random molecular graphs, 3-D geometries relaxed under a simple harmonic
bond + soft-core repulsion force field, and "atomization energies" from
a standard bond-enthalpy table plus the residual strain energy. All
deterministic (seed 0). The loader (`graphdot_tpu.dataset.qm7_fixture`)
prefers the real qm7.mat whenever it exists locally.

Run: python scripts/make_qm7_fixture.py  (writes tests/fixtures/
qm7_surrogate.npz)
"""
import os

import numpy as np

VALENCE = {1: 1, 6: 4, 7: 3, 8: 2, 16: 2}
COVALENT_R = {1: 0.31, 6: 0.76, 7: 0.71, 8: 0.66, 16: 1.05}
# mean single-bond enthalpies, kcal/mol (standard tables)
BOND_KCAL = {
    (1, 1): 104, (1, 6): 99, (1, 7): 93, (1, 8): 111, (1, 16): 87,
    (6, 6): 83, (6, 7): 73, (6, 8): 86, (6, 16): 65,
    (7, 7): 39, (7, 8): 48, (7, 16): 55,
    (8, 8): 35, (8, 16): 62, (16, 16): 54,
}


def random_valence_graph(rng, n_heavy):
    """Random connected heavy-atom tree (+ optional ring closure) with
    free valences saturated by hydrogens. Returns (numbers, bonds)."""
    heavy = rng.choice([6, 6, 6, 7, 8, 16], size=n_heavy,
                       p=[0.3, 0.3, 0.15, 0.12, 0.08, 0.05])
    numbers = list(heavy)
    free = [VALENCE[z] for z in heavy]
    bonds = []
    # random spanning tree
    for i in range(1, n_heavy):
        parents = [j for j in range(i) if free[j] > 0]
        if not parents:
            break
        j = int(rng.choice(parents))
        bonds.append((j, i))
        free[j] -= 1
        free[i] -= 1
    # one ring closure when valences allow
    if n_heavy >= 4 and rng.random() < 0.4:
        open_pairs = [
            (a, b) for a in range(n_heavy) for b in range(a + 2, n_heavy)
            if free[a] > 0 and free[b] > 0 and (a, b) not in bonds
        ]
        if open_pairs:
            a, b = open_pairs[int(rng.integers(len(open_pairs)))]
            bonds.append((a, b))
            free[a] -= 1
            free[b] -= 1
    # saturate with hydrogens
    for i in range(n_heavy):
        for _ in range(free[i]):
            numbers.append(1)
            bonds.append((i, len(numbers) - 1))
    return np.array(numbers), bonds


def relax(numbers, bonds, rng, steps=800, lr=0.02):
    """Gradient-descent relaxation: harmonic bonds at covalent-radius
    sums, soft-core repulsion between nonbonded pairs. Returns
    (positions, strain) with strain the residual bond energy."""
    n = len(numbers)
    pos = rng.normal(size=(n, 3)) * 0.5
    # spread initial guess along the bond tree
    for a, b in bonds:
        pos[b] = pos[a] + rng.normal(size=3) * 0.8
    r0 = np.array([
        COVALENT_R[numbers[a]] + COVALENT_R[numbers[b]] for a, b in bonds
    ])
    ba = np.array([a for a, _ in bonds])
    bb = np.array([b for _, b in bonds])
    bonded = set((min(a, b), max(a, b)) for a, b in bonds)
    ii, jj = np.triu_indices(n, 1)
    nb = np.array([
        (i, j) for i, j in zip(ii, jj) if (i, j) not in bonded
    ]).reshape(-1, 2)

    for _ in range(steps):
        grad = np.zeros_like(pos)
        d = pos[bb] - pos[ba]
        dist = np.linalg.norm(d, axis=1) + 1e-12
        pull = (2.0 * (dist - r0) / dist)[:, None] * d
        np.add.at(grad, bb, pull)
        np.add.at(grad, ba, -pull)
        if len(nb):
            d2 = pos[nb[:, 1]] - pos[nb[:, 0]]
            dist2 = np.linalg.norm(d2, axis=1) + 1e-12
            # soft core with 2.2 A range
            push = np.where(dist2 < 2.2, -4.0 * (2.2 - dist2) / dist2,
                            0.0)[:, None] * d2
            np.add.at(grad, nb[:, 1], push)
            np.add.at(grad, nb[:, 0], -push)
        pos -= lr * grad
    d = np.linalg.norm(pos[bb] - pos[ba], axis=1)
    strain = float(np.sum(23.0 * (d - r0) ** 2))  # kcal/mol-ish
    return pos, strain


def bond_energy(numbers, bonds):
    return float(sum(
        BOND_KCAL[(min(numbers[a], numbers[b]),
                   max(numbers[a], numbers[b]))]
        for a, b in bonds
    ))


def main(n_molecules=100, seed=0, out='tests/fixtures/qm7_surrogate.npz'):
    rng = np.random.default_rng(seed)
    all_numbers, all_pos, offsets, energies = [], [], [0], []
    for _ in range(n_molecules):
        n_heavy = int(rng.integers(2, 8))
        numbers, bonds = random_valence_graph(rng, n_heavy)
        pos, strain = relax(numbers, bonds, rng)
        # atomization energy = bonds minus strain (sign: more negative =
        # more stable, following QM7's convention of negative energies)
        energies.append(-(bond_energy(numbers, bonds) - strain))
        all_numbers.append(numbers)
        all_pos.append(pos)
        offsets.append(offsets[-1] + len(numbers))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        numbers=np.concatenate(all_numbers).astype(np.int8),
        positions=np.concatenate(all_pos).astype(np.float32),
        offsets=np.array(offsets, dtype=np.int32),
        energy=np.array(energies, dtype=np.float32),
        seed=np.array([seed]),
    )
    print(f'wrote {out}: {n_molecules} molecules, '
          f'{offsets[-1]} atoms, energies '
          f'[{min(energies):.1f}, {max(energies):.1f}] kcal/mol')


if __name__ == '__main__':
    main()
