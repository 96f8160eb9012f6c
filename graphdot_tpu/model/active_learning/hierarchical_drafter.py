"""Hierarchical representative-sample selection (reference:
``graphdot/model/active_learning/hierarchical_drafter.py:6``)."""
import numpy as np


class HierarchicalDrafter:
    """Hierarchically select representative samples from a large dataset
    via recursive k-way divide-and-conquer, carrying ``a * n / k`` samples
    per branch so the leaf selector always has headroom.

    Parameters
    ----------
    selector: callable
        Picks a given number of samples from a dataset to maximize an
        acquisition function (e.g. VarianceMinimizer).
    k: int > 1
        Branching factor of the hierarchy.
    a: float in (1, k]
        Oversampling multiplier per level.
    leaf_ratio: float in (0, 1) or 'auto'
        Stop dividing when the output/input ratio exceeds this.
    """

    def __init__(self, selector, k=2, a=2, leaf_ratio='auto'):
        assert k > 1, 'k must be an integer greater than 1'
        assert callable(selector)
        self.selector = selector
        self.k = k
        self.a = a
        self.leaf_ratio = 0.5 if leaf_ratio == 'auto' else leaf_ratio

    def __call__(self, X, n, random_state=None, verbose=False):
        """Pick a sorted list of n sample indices from X."""
        assert len(X) >= n
        if not isinstance(X, np.ndarray):
            X = np.asarray(X, dtype=object)

        if isinstance(random_state, np.random.Generator):
            rng = random_state
        elif random_state is not None:
            rng = np.random.Generator(np.random.PCG64(random_state))
        else:
            rng = np.random.default_rng()

        return np.sort(
            self._pick(X, rng.permutation(len(X)), n, verbose=verbose)
        )

    def _pick(self, X, nominee, n, lvl=0, verbose=False):
        if verbose:
            print(
                (' ' * lvl) + f'C_{len(nominee)}_{n}',
                n / len(nominee), self.leaf_ratio
            )
        if len(nominee) <= n:
            return nominee
        elif n / len(nominee) < self.leaf_ratio and n > self.k / self.a:
            stops = np.linspace(0, len(nominee), self.k + 1, dtype=int)
            nominee = np.concatenate([
                self._pick(
                    X, nominee[b:e], int(n * self.a // self.k), lvl + 1,
                    verbose=verbose
                )
                for b, e in zip(stops[:-1], stops[1:])
            ])
        return nominee[self.selector(X[nominee], n)]
