"""Tree-of-iterables helpers for hyperparameter flattening.

API parity with the reference ``graphdot/util/iterable.py`` (flatten,
fold_like, replace, argmax) — used for the flat log-theta <-> hierarchical
hyperparameter-tree round trip.
"""


def flatten(iterable):
    """Depth-first iteration through a tree of lists/tuples."""
    for item in iterable:
        if isinstance(item, (list, tuple)):
            yield from flatten(item)
        else:
            yield item


def fold_like(flat, example):
    """Reshape a flat sequence into the tree structure of ``example``."""
    flat = list(flat)
    folded = []
    for item in example:
        if hasattr(item, '__iter__'):
            n = len(list(flatten(item)))
            folded.append(fold_like(flat[:n], item))
            flat = flat[n:]
        else:
            folded.append(flat[0])
            flat = flat[1:]
    return tuple(folded)


def replace(iterable, old, new):
    """Yield items, replacing every occurrence of ``old`` with ``new``."""
    for item in iterable:
        if item == old:
            yield new
        else:
            yield item


def argmax(iterable, less):
    best = None
    for i in iterable:
        if best is None or less(best, i):
            best = i
    return best
