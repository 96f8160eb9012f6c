"""Spectral (eigendecomposition-based) Hermitian matrix functions.

The decompositions run on the accelerator through JAX
(:mod:`graphdot_tpu.linalg._exec`); eigenvalue filtering happens on host
because truncation changes array shapes.

Public semantics track the reference library
(``graphdot/linalg/spectral.py:6,55``): ``pinvh`` keeps only *positive*
eigenvalues so that nearly-singular Gram matrices with elementwise noise
cannot produce runaway log-likelihood terms in GPR.
"""
import numpy as np

from ._exec import eigh


class Spectrum:
    """Eigendecomposition of a Hermitian matrix with optional filtering.

    Parameters
    ----------
    H: Hermitian ndarray.
    rcond: float or None
        Relative eigenvalue cutoff ``rcond * max(eigenvalue)``.
    mode: 'truncate' drops eigenpairs below the cutoff; 'clamp' lifts
        their eigenvalues up to it.
    positive: bool
        Apply the cutoff against positive eigenvalues only (drops the
        negative tail entirely under 'truncate').
    """

    def __init__(self, H, rcond=None, mode='truncate', positive=False):
        values, vectors = eigh(H)
        if rcond is not None:
            cutoff = values[-1] * rcond
            above = values > cutoff
            if mode == 'truncate':
                values = values[above]
                vectors = vectors[:, above]
            elif mode == 'clamp':
                values = np.where(above, values, cutoff) if positive \
                    else np.maximum(values, cutoff)
            else:
                raise RuntimeError(
                    f"Unknown pseudoinverse mode '{mode}'.")
        self.values = values
        self.vectors = vectors

    def function(self, f, symmetric=True):
        """Assemble ``Q f(a) Q^T`` (or ``Q f(a)`` when not symmetric)."""
        scaled = self.vectors * f(self.values)
        return scaled @ self.vectors.T if symmetric else scaled

    @property
    def logdet(self):
        return float(np.sum(np.log(self.values)))


def powerh(H, p, rcond=None, mode='truncate', return_symmetric=True,
           return_eigvals=False):
    r"""Fractional power :math:`H^p` of a Hermitian matrix.

    Raises ``numpy.linalg.LinAlgError`` when a non-positive spectrum makes
    the requested power ill-defined (p < 1, p != 0). With
    ``return_symmetric=False`` only the half-transform ``Q a^p`` is
    returned — the form Nystrom models multiply cross-kernels against.
    """
    s = Spectrum(H, rcond=rcond, mode=mode)
    if p < 1 and p != 0 and np.any(s.values <= 0):
        raise np.linalg.LinAlgError(
            f'Cannot raise a non-positive-definite matrix to the power '
            f'{p}.')
    Hp = s.function(lambda a: a ** p, symmetric=return_symmetric)
    return (Hp, s.values) if return_eigvals else Hp


def pinvh(H, rcond=1e-10, mode='truncate', return_nlogdet=False):
    """Pseudoinverse of a Hermitian matrix over its positive eigenspace,
    optionally with the log-determinant of the retained spectrum."""
    s = Spectrum(H, rcond=rcond, mode=mode, positive=True)
    H_inv = s.function(lambda a: 1.0 / a)
    return (H_inv, s.logdet) if return_nlogdet else H_inv
