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
  counterpart of the reference's one-kernel CUDA solver). The coupling
  matrix, incidence one-hots, and CG state stay in VMEM across all
  iterations, so per-iteration HBM traffic drops to zero, and ~f32
  accuracy needs only 2 MXU passes per contraction (split-operand trick,
  see ``ops/pallas_pcg.py``). On v5e this is the fastest path: 13.7 vs
  23.3 ms per sustained 8256-pair Gram build (~600k vs ~355k pairs/s)
  at 1e-6 agreement with 'edge'. Tradeoff: Mosaic compilation adds
  ~30-60 s per distinct pair-group shape; 'edge' stays the default for
  short-lived sessions.
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
