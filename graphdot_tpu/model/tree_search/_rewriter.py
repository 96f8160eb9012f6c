"""Sequence rewriters for tree search (reference:
``graphdot/model/tree_search/_rewriter.py:29-215``).

The n-gram context tree is re-implemented as a plain nested-dict trie
instead of the reference's ``treelib`` dependency.
"""
from abc import ABC, abstractmethod
import itertools as it

import numpy as np


class AbstractRewriter(ABC):
    """Abstract base class for graph rewrite rules."""

    @abstractmethod
    def __call__(self, g):
        """Rewrite the given graph using a rule drawn randomly from a pool;
        returns a list of new graphs."""


class _TrieNode:
    """One node of the n-gram trie: symbol counts/frequencies plus
    children."""

    __slots__ = ('count', 'freq', 'children')

    def __init__(self):
        self.count = 0
        self.freq = 0.0
        self.children = {}

    def child(self, symbol):
        if symbol not in self.children:
            self.children[symbol] = _TrieNode()
        return self.children[symbol]

    def normalize(self):
        total = sum(c.count for c in self.children.values())
        for c in self.children.values():
            c.freq = c.count / total if total > 0 else 0.0
            c.normalize()


class LookAheadSequenceRewriter(AbstractRewriter):
    """A sequence rewriter performing contextual insert/mutate/delete edits
    where inserted/mutated symbols are drawn from the distribution of
    symbols following the longest matching k-gram (k <= n) of the training
    set.

    Parameters
    ----------
    n: int
        Maximum look-behind context length.
    b: int
        Branching factor — number of offspring per input sequence.
    min_edits, max_edits: int
        Minimum/maximum number of edits per offspring.
    p_insert, p_mutate, p_delete: numbers
        Relative frequencies of the three operations.
    random_state: np.random.Generator or int
    """

    def __init__(self, n=1, b=3, min_edits=1, max_edits=5, p_insert=1,
                 p_mutate=1, p_delete=1, random_state=None):
        self.n = n
        self.b = b
        self.p_imd = np.array(
            [p_insert, p_mutate, p_delete], dtype=float
        )
        self.p_imd /= self.p_imd.sum()
        self.min_edits = min_edits
        self.max_edits = max_edits
        self.rng = self._parse_random_state(random_state)

    @staticmethod
    def _parse_random_state(random_state):
        if isinstance(random_state, np.random.Generator):
            return random_state
        elif random_state is not None:
            return np.random.Generator(np.random.PCG64(random_state))
        else:
            return np.random.default_rng()

    @property
    def tree(self):
        """The trie of 1- to n-gram context distributions."""
        try:
            return self._tree
        except AttributeError:
            raise RuntimeError(
                'The rewriter must be trained on a collection of sequences '
                'first using the ``fit()`` method.'
            )

    def fit(self, X):
        """Learn the n-gram distribution from the given sequences."""
        root = _TrieNode()
        for seq in X:
            # ptrs[i] tracks the trie node for the context starting i
            # symbols back; keep at most n+1 live pointers
            ptrs = []
            for symbol in seq:
                ptrs.append(root)
                if len(ptrs) > self.n + 1:
                    ptrs.pop(0)
                for i, p in enumerate(ptrs):
                    nxt = p.child(symbol)
                    nxt.count += 1
                    ptrs[i] = nxt
        root.normalize()
        self._tree = root
        return self

    def _match_context(self, s, k):
        """The trie node of the longest k-gram ending right before position
        k that has a non-empty continuation distribution."""
        n = self.n
        root = self.tree
        ptrs = [root for _ in range(n + 1)]
        for i, loc in enumerate(range(max(k - n, 0), k)):
            for j in range(i + 1):
                p = ptrs[j]
                if p is not None:
                    ptrs[j] = p.children.get(s[loc])
        for node in ptrs:
            if node is not None and node.children:
                return node
        return root

    def _propose(self, s, k):
        cxt = self._match_context(s, k)
        symbols = list(cxt.children.keys())
        freq = np.array([cxt.children[x].freq for x in symbols])
        freq = freq / freq.sum()
        return symbols[self.rng.choice(len(symbols), p=freq)]

    def _insert(self, s, k):
        return s[:k] + type(s)(self._propose(s, k)) + s[k:]

    def _mutate(self, s, k):
        return s[:k] + type(s)(self._propose(s, k)) + s[k + 1:]

    def _delete(self, s, k):
        return s[:k] + s[k + 1:]

    def _rewrite(self, s):
        """Apply one random insert/mutate/delete edit to the sequence."""
        if len(s) == 0:
            # insertion is the only valid edit on an empty sequence
            # (the reference raises from ``rng.choice(0)`` here,
            # ``graphdot/model/tree_search/_rewriter.py:190``)
            return self._insert(s, 0)
        op_idx = self.rng.choice(3, p=self.p_imd)
        op = [self._insert, self._mutate, self._delete][op_idx]
        k = self.rng.choice(len(s))
        return op(s, k)

    def __call__(self, s):
        """Generate up to ``b`` unique offspring sequences, each rewritten
        between min_edits and max_edits times."""
        offspring = set([s])
        for t in it.repeat(s, self.b):
            for i in range(self.max_edits):
                t = self._rewrite(t)
                if i >= self.min_edits - 1 and t not in offspring:
                    offspring.add(t)
                    break
        offspring.remove(s)
        return list(offspring)
