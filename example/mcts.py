#!/usr/bin/env python
"""Monte Carlo tree search over sequence rewrites with a GP surrogate
(reference: ``example/mcts.py``)."""
import numpy as np

from graphdot_tpu.model.gaussian_process import GaussianProcessRegressor
from graphdot_tpu.model.tree_search import (
    LookAheadSequenceRewriter, MCTSGraphTransformer
)


class StringKernel:
    """A simple normalized common-bigram kernel over strings."""

    def _feats(self, s):
        return {s[i:i + 2] for i in range(len(s) - 1)} | set(s)

    def __call__(self, X, Y=None, eval_gradient=False):
        Y = X if Y is None else Y
        K = np.array([
            [
                len(self._feats(a) & self._feats(b))
                / max(1, np.sqrt(
                    len(self._feats(a)) * len(self._feats(b))
                ))
                for b in Y
            ]
            for a in X
        ])
        return K

    def diag(self, X):
        return np.ones(len(X))

    @property
    def theta(self):
        return np.zeros(0)

    @theta.setter
    def theta(self, t):
        pass

    @property
    def bounds(self):
        return np.zeros((0, 2))


train = ['abcd', 'aabb', 'abab', 'ddcc', 'dcba', 'accd', 'abdd']
y = np.array([float(s.count('ab')) for s in train])

surrogate = GaussianProcessRegressor(StringKernel(), alpha=1e-4)
surrogate.fit(np.asarray(train, dtype=object), y)

rewriter_seq = LookAheadSequenceRewriter(n=2, b=4, random_state=0)
rewriter_seq.fit(train)

tf = MCTSGraphTransformer(
    rewriter=lambda node, rng: rewriter_seq(node.g),
    surrogate=surrogate
)
result = tf.seek(g0='dcdc', target=2.0, maxiter=10, random_state=0)
print(result.head(10))
