"""Backend selection (reference: ``graphdot/kernel/marginalized/_backend.py``
and ``_backend_factory.py``).

The TPU build has a single JAX/XLA backend with two matvec strategies:

- ``'edge'`` (default for ``'auto'``): edge-factored matvec — four MXU
  matmuls per CG iteration over per-pair edge-kernel matrices. Scales as
  O(M1 M2 (n1+n2)) per matvec and is the production path.
- ``'dense'``: dense product-graph coupling tensor — one big contraction
  per CG iteration, O(n1^2 n2^2); the direct transcription of the CPU
  oracle, used for validation and tiny graphs.
- ``'pallas'``: the edge-factored operands with the whole PCG loop fused
  into a single VMEM-resident Pallas kernel per block of pairs (the
  counterpart of the reference's one-kernel CUDA solver). Currently
  experimental: on v5e it trails the XLA edge path (96.6k vs 133.6k
  pairs/s on the 128-molecule benchmark) because 24-atom tiles use 24 of
  128 lanes and the per-pair matvec is unrolled; kept for further lane-
  packing work.
"""


class Backend:
    """Computing engine that solves the marginalized graph kernel's
    generalized Laplacian equation."""

    MODES = ('edge', 'dense', 'pallas')

    def __init__(self, mode='edge'):
        if mode not in self.MODES:
            raise ValueError(f'Unknown backend mode {mode!r}')
        self.mode = mode


def backend_factory(backend, **kwargs):
    if isinstance(backend, Backend):
        return backend
    if backend == 'auto':
        return Backend('edge')
    if backend in Backend.MODES:
        return Backend(backend)
    raise ValueError(f"Unknown backend {backend!r}")
