"""Hermitian fractional powers and pseudoinverse via eigendecomposition
(reference: ``graphdot/linalg/spectral.py:6,55``).

``pinvh`` keeps only *positive* eigenvalues (unlike scipy.linalg.pinvh) so
that nearly-singular Gram matrices with ~1e-7 elementwise noise cannot
produce large negative log-likelihoods in GPR.
"""
import numpy as np


def powerh(H, p, rcond=None, mode='truncate', return_symmetric=True,
           return_eigvals=False):
    r"""Compute :math:`H^p` of a Hermitian matrix via eigendecomposition.

    Parameters
    ----------
    H: Hermitian matrix.
    p: float power.
    rcond: float or None
        Relative cutoff for small eigenvalues.
    mode: 'truncate' discards small eigenvalues; 'clamp' raises them to
        ``rcond * max_eigenvalue``.
    return_symmetric: bool
        If True return ``Q a^p Q^T``, else ``Q a^p``.
    """
    a, Q = np.linalg.eigh(H)
    if rcond is not None:
        beta = a.max() * rcond
        if mode == 'truncate':
            keep = a > beta
            a, Q = a[keep], Q[:, keep]
        elif mode == 'clamp':
            a = np.maximum(a, beta)
        else:
            raise RuntimeError(f"Unknown pseudoinverse mode '{mode}'.")
    if np.any(a <= 0) and p < 1 and p != 0:
        raise np.linalg.LinAlgError(
            f'Cannot raise a non-positive definite matrix to a power of '
            f'{p}.'
        )
    Hp = Q * a ** p
    if return_symmetric:
        Hp = Hp @ Q.T
    return (Hp, a) if return_eigvals is True else Hp


def pinvh(H, rcond=1e-10, mode='truncate', return_nlogdet=False):
    r"""Pseudoinverse of a Hermitian matrix keeping positive eigenvalues
    only; optionally returns the negative log-determinant."""
    a, Q = np.linalg.eigh(H)
    beta = a.max() * rcond
    keep = a > beta
    if mode == 'truncate':
        a, Q = a[keep], Q[:, keep]
    elif mode == 'clamp':
        a = np.where(keep, a, beta)
    else:
        raise RuntimeError(f"Unknown pseudoinverse mode '{mode}'.")
    H_inv = (Q / a) @ Q.T
    if return_nlogdet is True:
        return H_inv, np.sum(np.log(a))
    return H_inv
