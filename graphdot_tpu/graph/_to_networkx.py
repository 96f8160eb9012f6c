"""Convertor to NetworkX Graph objects (reference:
``graphdot/graph/_to_networkx.py``)."""
import networkx as nx


def _to_networkx(graph):
    """Convert to NetworkX ``Graph``."""
    nxgraph = nx.from_pandas_edgelist(
        graph.edges.to_pandas(),
        source='!i',
        target='!j',
        edge_attr=True
    )
    nxgraph.graph['title'] = graph.title
    nx.set_node_attributes(
        nxgraph,
        {i: r._asdict() for i, r in graph.nodes.iterrows()}
    )
    return nxgraph
