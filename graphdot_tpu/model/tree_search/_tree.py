"""Search-tree container: a column frame of node records with parent and
children links (fills the role of the reference's
``graphdot/model/tree_search/_tree.py:6``)."""
from ...graph.frame import DataFrame


class Tree(DataFrame):
    """A dataframe whose rows are search-tree nodes; the 'children' column
    holds nested Trees and 'parent' holds NodeView back-references."""

    class NodeView:
        """Mutable row proxy: attribute access reads/writes tree columns."""

        def __init__(self, tree, i):
            self.__dict__.update(tree=tree, i=i)

        def __getattr__(self, key):
            if key.startswith('__'):
                # numpy and pickle probe dunder attributes on arbitrary
                # objects; never forward those to tree columns
                raise AttributeError(key)
            return self.tree[key][self.i]

        def __setattr__(self, key, val):
            self.tree[key][self.i] = val

        def __str__(self):
            pairs = (
                f'{c}:{getattr(self, c)}' for c in self.tree.columns
            )
            return ' '.join(pairs)

    def __init__(self, data={}, **kwargs):
        merged = dict(data)
        merged.update(kwargs)
        super().__init__(merged)

    def iternodes(self):
        """Yield a NodeView per row."""
        for i in range(len(self)):
            yield Tree.NodeView(self, i)

    @property
    def flat(self):
        """Depth-first flattening into a plain DataFrame with a 'level'
        column (parent/children links dropped)."""
        payload = [
            c for c in self.columns if c not in ('parent', 'children')
        ]

        rows = []

        def walk(tree, level):
            for vals, children in zip(
                zip(*[tree[c] for c in payload]), tree.children
            ):
                rows.append((level,) + vals)
                if children is not None:
                    walk(children, level + 1)

        walk(self, 0)
        columns = dict(zip(['level'] + payload, zip(*rows)))
        return DataFrame(columns)

    def __str__(self):
        return '\n'.join(
            '  ' * node.level + str(node)
            for node in self.flat.itertuples('node')
        )
