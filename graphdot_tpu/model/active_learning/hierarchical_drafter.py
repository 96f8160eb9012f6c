"""Hierarchical representative-sample selection (fills the role of the
reference's ``graphdot/model/active_learning/hierarchical_drafter.py:6``).

Selecting n representatives from a large set with an O(N^2)-or-worse
selector is made tractable by recursive k-way divide and conquer: each
branch forwards an oversampled shortlist (a*n/k candidates) so the parent
selector always has headroom to correct branch-local choices.
"""
import numpy as np


class HierarchicalDrafter:
    """Divide-and-conquer wrapper around an expensive subset selector.

    Parameters
    ----------
    selector: callable(X, n) -> indices
        The leaf-level selection algorithm (e.g. VarianceMinimizer).
    k: int > 1
        Branching factor.
    a: float in (1, k]
        Oversampling multiplier per level.
    leaf_ratio: float in (0, 1) or 'auto'
        When output/input exceeds this ratio, select directly instead of
        dividing further.
    """

    def __init__(self, selector, k=2, a=2, leaf_ratio='auto'):
        assert k > 1, 'k must be an integer greater than 1'
        assert callable(selector)
        self.selector = selector
        self.k = k
        self.a = a
        self.leaf_ratio = 0.5 if leaf_ratio == 'auto' else leaf_ratio

    def __call__(self, X, n, random_state=None, verbose=False):
        """Pick a sorted array of n sample indices from X."""
        assert len(X) >= n
        if not isinstance(X, np.ndarray):
            X = np.asarray(X, dtype=object)
        if isinstance(random_state, np.random.Generator):
            rng = random_state
        elif random_state is not None:
            rng = np.random.Generator(np.random.PCG64(random_state))
        else:
            rng = np.random.default_rng()

        shuffled = rng.permutation(len(X))
        return np.sort(self._pick(X, shuffled, n, verbose=verbose))

    def _pick(self, X, pool, n, depth=0, verbose=False):
        if verbose:
            print(
                ' ' * depth + f'C_{len(pool)}_{n}',
                n / len(pool), self.leaf_ratio
            )
        if len(pool) <= n:
            return pool
        if n / len(pool) < self.leaf_ratio and n > self.k / self.a:
            # recurse: each of the k branches forwards a*n/k candidates
            carry = int(n * self.a // self.k)
            cuts = np.linspace(0, len(pool), self.k + 1, dtype=int)
            shortlists = [
                self._pick(X, pool[lo:hi], carry, depth + 1,
                           verbose=verbose)
                for lo, hi in zip(cuts[:-1], cuts[1:])
            ]
            pool = np.concatenate(shortlists)
        return pool[self.selector(X[pool], n)]
