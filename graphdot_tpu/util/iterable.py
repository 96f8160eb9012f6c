"""Tree-of-iterables helpers for hyperparameter flattening (fill the role
of the reference's ``graphdot/util/iterable.py``): the flat log-theta <->
hierarchical hyperparameter-tree round trip."""


def flatten(iterable):
    """Depth-first iteration through a tree of lists/tuples."""
    stack = [iter(iterable)]
    while stack:
        try:
            item = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if isinstance(item, (list, tuple)):
            stack.append(iter(item))
        else:
            yield item


def fold_like(flat, example):
    """Reshape a flat sequence into the tree structure of ``example``."""
    it = iter(flat)

    def build(template):
        out = []
        for node in template:
            if hasattr(node, '__iter__'):
                out.append(build(node))
            else:
                out.append(next(it))
        return tuple(out)

    return build(example)


def replace(iterable, old, new):
    """Yield items, substituting every occurrence of ``old`` with
    ``new``."""
    return (new if item == old else item for item in iterable)


def argmax(iterable, less):
    """The element that is not ``less`` than any other, by pairwise
    comparison (``less(a, b)`` meaning ``a < b``)."""
    from functools import reduce
    return reduce(lambda a, b: b if a is None or less(a, b) else a,
                  iterable, None)
