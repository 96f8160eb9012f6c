"""Monte Carlo tree search over graph rewrites (reference:
``graphdot/model/tree_search/graph_transformer.py:9``)."""
import numpy as np
from scipy.stats import norm

from ...util.iterable import argmax
from ._tree import Tree


class MCTSGraphTransformer:
    """A variant of Monte Carlo tree search for optimization and
    root-finding in a space of graphs: select by likelihood-UCB, expand via
    a rewriter, evaluate with a GP surrogate (predictive mean + cov), and
    back-propagate inverse-variance-weighted statistics.

    Parameters
    ----------
    rewriter: callable
        Implements the Rewriter interface (node, rng) -> list of graphs.
    surrogate: object
        Predictor with ``predict(X, return_cov=True)``.
    exploration_bias: float
        Exploitation/exploration trade-off in the UCB score.
    precision: float
        Target precision of the search outcome.
    """

    def __init__(self, rewriter, surrogate, exploration_bias=1.0,
                 precision=0.01):
        self.rewriter = rewriter
        self.surrogate = surrogate
        self.exploration_bias = exploration_bias
        self.precision = precision

    def seek(self, g0, target, maxiter=500, return_tree=False,
             random_state=None):
        """Transform g0 toward a graph with the target property value;
        returns the search tree (or its flattened, likelihood-sorted
        dataframe)."""
        random_state = self._parse_random_state(random_state)
        tree = self._spawn(None, [g0])
        self._evaluate(tree)
        for _ in range(maxiter):
            self._mcts_step(
                tree,
                lambda nodes: self._likelihood_ucb(target, nodes),
                random_state=random_state
            )
        if return_tree is True:
            return tree
        else:
            df = tree.flat
            df['likelihood'] = self._likelihood(target, df)
            return df.to_pandas().sort_values(
                ['likelihood'], ascending=False
            )

    @staticmethod
    def _parse_random_state(random_state):
        if isinstance(random_state, np.random.Generator):
            return random_state
        elif random_state is not None:
            return np.random.Generator(np.random.PCG64(random_state))
        else:
            return np.random.default_rng()

    def _spawn(self, node, leaves):
        return Tree(
            parent=[node] * len(leaves),
            children=[None] * len(leaves),
            g=leaves,
            visits=np.zeros(len(leaves), dtype=int)
        )

    def _likelihood(self, target, nodes):
        return norm.pdf(
            target, nodes.tree_mean,
            np.maximum(nodes.tree_std, self.precision)
        )

    def _confidence_bounds(self, nodes):
        return self.exploration_bias * np.sqrt(
            np.log(nodes.parent[0].visits) / nodes.visits
        )

    def _likelihood_ucb(self, target, nodes):
        return (
            self._likelihood(target, nodes)
            + self._confidence_bounds(nodes)
        )

    def _evaluate(self, nodes):
        mean, cov = self.surrogate.predict(nodes.g, return_cov=True)
        nodes['self_mean'] = mean.copy()
        nodes['tree_mean'] = mean.copy()
        nodes['self_std'] = cov.diagonal() ** 0.5
        nodes['tree_std'] = cov.diagonal() ** 0.5
        nodes['score'] = np.zeros_like(mean)
        nodes.visits += 1

    def _mcts_step(self, tree, score_fn, random_state):
        # selection
        n = next(tree.iternodes())
        n.visits += 1
        while n.children is not None:
            n = argmax(
                n.children.iternodes(),
                lambda i, j: i.score < j.score
            )
            n.visits += 1

        # expansion
        n.children = self._spawn(n, self.rewriter(n, random_state))

        # simulation
        self._evaluate(n.children)

        # back-propagation
        p = n
        while p:
            p.tree_mean = np.average(
                p.children.tree_mean,
                weights=p.children.tree_std ** -2
            )
            p.tree_std = np.average(
                (p.children.tree_mean - p.tree_mean) ** 2,
                weights=p.children.tree_std ** -2
            ) ** 0.5
            p.children['score'] = score_fn(p.children)
            p = p.parent
