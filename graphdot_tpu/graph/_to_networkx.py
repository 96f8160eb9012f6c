"""Graph -> NetworkX export (fills the role of the reference's
``graphdot/graph/_to_networkx.py``)."""
import networkx as nx


def _to_networkx(graph):
    """Rebuild a ``networkx.Graph`` carrying all node and edge
    attributes of this Graph."""
    out = nx.from_pandas_edgelist(
        graph.edges.to_pandas(), source='!i', target='!j', edge_attr=True
    )
    out.graph['title'] = graph.title
    node_attrs = {
        i: row._asdict() for i, row in graph.nodes.iterrows()
    }
    nx.set_node_attributes(out, node_attrs)
    return out
