"""Active learning and tree search tests (reference strategy:
``test/model/active_learning``, ``test/model/tree_search``)."""
import numpy as np
import pytest

from graphdot_tpu.model.active_learning import (
    DeterminantMaximizer, HierarchicalDrafter, VarianceMinimizer
)
from graphdot_tpu.model.tree_search import LookAheadSequenceRewriter

np.random.seed(0)


def _rbf_kernel_matrix(X, s=0.3):
    d2 = (X[:, None] - X[None, :]) ** 2
    return np.exp(-0.5 * d2 / s ** 2)


class RBF:
    def __call__(self, X, **kw):
        return _rbf_kernel_matrix(np.asarray(X, dtype=float))


def test_variance_minimizer_spreads():
    X = np.concatenate([
        np.linspace(0, 1, 20), [5.0]
    ])
    chosen = VarianceMinimizer(RBF())(X, 5)
    assert len(set(chosen)) == 5
    # the isolated point cannot be explained by the cluster and must be
    # picked once the cluster is covered
    assert 20 in chosen


def test_variance_minimizer_precomputed():
    X = np.linspace(0, 1, 12)
    K = _rbf_kernel_matrix(X)
    c1 = VarianceMinimizer('precomputed')(K, 4)
    c2 = VarianceMinimizer(RBF())(X, 4)
    assert sorted(c1) == sorted(c2)


def test_determinant_maximizer():
    X = np.concatenate([np.linspace(0, 0.2, 10), [3.0, 6.0]])
    chosen = DeterminantMaximizer(RBF())(X, 3)
    assert len(set(chosen)) == 3
    assert 10 in chosen and 11 in chosen  # both isolated points chosen


def test_hierarchical_drafter():
    X = np.linspace(0, 1, 64)
    drafter = HierarchicalDrafter(VarianceMinimizer(RBF()), k=2, a=2)
    chosen = drafter(X, 8, random_state=0)
    assert len(chosen) == 8
    assert len(set(chosen.tolist())) == 8
    assert np.all(np.diff(chosen) > 0)  # sorted


def test_sequence_rewriter():
    rw = LookAheadSequenceRewriter(n=2, b=4, random_state=0)
    train = ['abab', 'baba', 'abba', 'aabb']
    rw.fit(train)
    offspring = rw('abab')
    assert 0 < len(offspring) <= 4
    for t in offspring:
        assert t != 'abab'
        assert set(t) <= {'a', 'b'}


def test_sequence_rewriter_context():
    # after 'a', only 'x' ever follows in training -> mutations at
    # position following 'a' should produce 'x'
    rw = LookAheadSequenceRewriter(
        n=1, b=8, p_insert=1, p_mutate=0, p_delete=0, random_state=0
    )
    rw.fit(['axaxax', 'axax'])
    proposals = {rw._propose('ax', 1) for _ in range(20)}
    assert proposals == {'x'}


def test_rewriter_unfit_raises():
    rw = LookAheadSequenceRewriter()
    with pytest.raises(RuntimeError):
        rw.tree
