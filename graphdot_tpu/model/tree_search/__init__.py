from ._rewriter import AbstractRewriter, LookAheadSequenceRewriter
from .graph_transformer import MCTSGraphTransformer

__all__ = [
    'MCTSGraphTransformer', 'LookAheadSequenceRewriter', 'AbstractRewriter'
]
