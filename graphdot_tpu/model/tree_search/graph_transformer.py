"""Monte Carlo tree search over graph rewrites (fills the role of the
reference's ``graphdot/model/tree_search/graph_transformer.py:9``).

Search loop per iteration: descend by maximal score (a Gaussian
target-likelihood plus a UCB exploration bonus), expand the reached leaf
with the rewriter, score the offspring with a GP surrogate, then propagate
inverse-variance-weighted means/stds back to the root.
"""
import numpy as np
from scipy.stats import norm

from ...util.iterable import argmax
from ._tree import Tree


def _as_rng(random_state):
    if isinstance(random_state, np.random.Generator):
        return random_state
    if random_state is not None:
        return np.random.Generator(np.random.PCG64(random_state))
    return np.random.default_rng()


class MCTSGraphTransformer:
    """MCTS-based optimization / root finding in a space of graphs.

    Parameters
    ----------
    rewriter: callable (node, rng) -> list of graphs
        Proposes rewritten offspring of a node's graph.
    surrogate: object
        Property predictor exposing ``predict(X, return_cov=True)``.
    exploration_bias: float
        Weight of the UCB exploration term.
    precision: float
        Floor on predictive stds when scoring against the target.
    """

    def __init__(self, rewriter, surrogate, exploration_bias=1.0,
                 precision=0.01):
        self.rewriter = rewriter
        self.surrogate = surrogate
        self.exploration_bias = exploration_bias
        self.precision = precision

    def seek(self, g0, target, maxiter=500, return_tree=False,
             random_state=None):
        """Search for graphs whose predicted property approaches
        ``target``, starting from ``g0``. Returns the search tree, or a
        likelihood-sorted flat dataframe."""
        rng = _as_rng(random_state)
        root = self._spawn(None, [g0])
        self._evaluate(root)
        for _ in range(maxiter):
            self._step(root, target, rng)
        if return_tree:
            return root
        flat = root.flat
        flat['likelihood'] = self._likelihood(target, flat)
        return flat.to_pandas().sort_values(
            ['likelihood'], ascending=False
        )

    # -- tree plumbing --------------------------------------------------

    def _spawn(self, parent, graphs):
        return Tree(
            parent=[parent] * len(graphs),
            children=[None] * len(graphs),
            g=graphs,
            visits=np.zeros(len(graphs), dtype=int),
        )

    def _evaluate(self, nodes):
        """Score fresh nodes with the surrogate's posterior."""
        mean, cov = self.surrogate.predict(nodes.g, return_cov=True)
        std = np.sqrt(cov.diagonal())
        nodes['self_mean'] = mean.copy()
        nodes['tree_mean'] = mean.copy()
        nodes['self_std'] = std.copy()
        nodes['tree_std'] = std.copy()
        nodes['score'] = np.zeros_like(mean)
        nodes.visits += 1

    # -- scoring ---------------------------------------------------------

    def _likelihood(self, target, nodes):
        return norm.pdf(
            target, nodes.tree_mean,
            np.maximum(nodes.tree_std, self.precision)
        )

    def _ucb(self, target, nodes):
        bonus = self.exploration_bias * np.sqrt(
            np.log(nodes.parent[0].visits) / nodes.visits
        )
        return self._likelihood(target, nodes) + bonus

    # -- one MCTS iteration ----------------------------------------------

    def _step(self, root, target, rng):
        # selection: walk down the max-score child
        node = next(root.iternodes())
        node.visits += 1
        while node.children is not None:
            node = argmax(
                node.children.iternodes(),
                lambda a, b: a.score < b.score
            )
            node.visits += 1

        # expansion + simulation
        node.children = self._spawn(node, self.rewriter(node, rng))
        self._evaluate(node.children)

        # back-propagation of precision-weighted statistics
        up = node
        while up:
            w = up.children.tree_std ** -2
            mean = np.average(up.children.tree_mean, weights=w)
            var = np.average(
                (up.children.tree_mean - mean) ** 2, weights=w
            )
            up.tree_mean = mean
            up.tree_std = np.sqrt(var)
            up.children['score'] = self._ucb(target, up.children)
            up = up.parent
