"""Lazy low-rank matrix algebra (reference:
``graphdot/linalg/low_rank.py:51-283``).

Square matrices are represented as products of tall-skinny factors
(``LATR``: L @ R; ``LLT``: symmetric L @ L^T from an SVD), and sums thereof
(``Sum``), so that Nystrom-style GPR models never materialize N-by-N
matrices.
"""
import numpy as np
import scipy.sparse.linalg as splin


class LowRankBase:
    def __add__(self, other):
        return add(self, other)

    def __sub__(self, other):
        return sub(self, other)

    def __matmul__(self, other):
        return matmul(self, other)


class Sum(LowRankBase):
    """Sum of factor approximations, stored as-is to preserve low-rank
    structure under inner products."""

    def __init__(self, factors):
        self.factors = factors

    def __repr__(self):
        return ' + '.join([f'({repr(f)})' for f in self.factors])

    @property
    def T(self):
        return Sum([f.T for f in self.factors])

    def __neg__(self):
        return Sum([-f for f in self.factors])

    def diagonal(self):
        return np.sum([f.diagonal() for f in self.factors], axis=0)

    def trace(self):
        return np.sum([f.diagonal().sum() for f in self.factors])

    def quadratic(self, a, b):
        """Computes a @ X @ b."""
        return np.sum([f.quadratic(a, b) for f in self.factors], axis=0)

    def todense(self):
        return np.sum([f.todense() for f in self.factors], axis=0)


class LATR(LowRankBase):
    r"""An N-by-N matrix represented as :math:`L \cdot R` with N-by-k and
    k-by-N factors, k << N."""

    def __init__(self, lhs, rhs):
        self._lhs = lhs
        self._rhs = rhs

    def __repr__(self):
        return f'{self.lhs.shape} @ {self.rhs.shape}'

    @property
    def lhs(self):
        return self._lhs

    @property
    def rhs(self):
        return self._rhs

    @property
    def T(self):
        return LATR(self.rhs.T, self.lhs.T)

    def __neg__(self):
        return LATR(-self.lhs, self.rhs)

    def todense(self):
        return self.lhs @ self.rhs

    def diagonal(self):
        return np.sum(self.lhs * self.rhs.T, axis=1)

    def trace(self):
        return self.diagonal().sum()

    def quadratic(self, a, b):
        """Computes a @ X @ b."""
        return (a @ self.lhs) @ (self.rhs @ b)

    def quadratic_diag(self, a, b):
        """Computes diag(a @ X @ b)."""
        return LATR(a @ self.lhs, self.rhs @ b).diagonal()


class LLT(LATR):
    r"""Symmetric PSD low-rank matrix :math:`L \cdot L^T` from a spectral
    decomposition; supports pinv/logdet/cond/power."""

    def __init__(self, X, rcond=0, mode='truncate'):
        if isinstance(X, np.ndarray):
            U, S, _ = np.linalg.svd(X, full_matrices=False)
            beta = S.max() * rcond
            if mode == 'truncate':
                keep = S >= beta
                self.U = U[:, keep]
                self.S = S[keep]
            elif mode == 'clamp':
                self.U = U
                self.S = np.maximum(S, beta)
            else:
                raise RuntimeError(
                    f"Unknown spectral approximation mode '{mode}'."
                )
        elif isinstance(X, tuple) and len(X) == 2:
            self.U, self.S = X
        self._lhs = self.U * self.S

    @property
    def lhs(self):
        return self._lhs

    @property
    def rhs(self):
        return self._lhs.T

    def diagonal(self):
        return np.sum(self.lhs ** 2, axis=1)

    def pinv(self):
        return LLT((self.U, 1 / self.S))

    def logdet(self):
        return 2 * np.log(self.S).sum()

    def cond(self):
        return (self.S.max() / self.S.min()) ** 2

    def __pow__(self, exp):
        return LLT((self.U, self.S ** exp))


def dot(X, Y=None, method='auto', rcond=0, mode='truncate'):
    r"""Create a low-rank matrix :math:`A \doteq X \cdot Y` ('direct'), or
    :math:`X X^T` through its SVD ('spectral', Y=None)."""
    assert method in ('auto', 'direct', 'spectral'), \
        f'Unknown method {method}'
    if Y is None:
        if method in ('spectral', 'auto'):
            return LLT(X, rcond=rcond, mode=mode)
        return LATR(X, X.T)
    if method == 'spectral':
        raise RuntimeError(
            'Spectral approximation only usable when Y is None.'
        )
    return LATR(X, Y)


def add(A, B):
    factors = A.factors if isinstance(A, Sum) else [A]
    factors += B.factors if isinstance(B, Sum) else [B]
    return Sum(factors)


def sub(A, B):
    factors = A.factors if isinstance(A, Sum) else [A]
    factors += [-f for f in B.factors] if isinstance(B, Sum) else [-B]
    return Sum(factors)


def matmul(A, B):
    if isinstance(A, Sum):
        if isinstance(B, Sum):
            return Sum([a @ b for a in A.factors for b in B.factors])
        return Sum([a @ B for a in A.factors])
    if isinstance(B, Sum):
        return Sum([A @ b for b in B.factors])
    if isinstance(B, LATR):
        return LATR(A.lhs, (A.rhs @ B.lhs) @ B.rhs)
    return A.lhs @ (A.rhs @ B)


def pinvh(A, d, k='auto', rcond=1e-10, mode='truncate'):
    """Low-rank pseudoinverse of a low-rank symmetric matrix plus diagonal
    regularization, via ARPACK eigsh on a lazy operator."""

    class MatVecOperator(splin.LinearOperator):

        def __init__(self, A, d):
            self.A = A
            self.d = d

        @property
        def shape(self):
            return (len(self.d), len(self.d))

        @property
        def dtype(self):
            return self.d.dtype

        def _matvec(self, b):
            return self.A @ b + self.d * b

        def _matmat(self, b):
            return self.A @ b + self.d[:, None] * b

        def _adjoint(self):
            return self

    if k == 'auto':
        k = A.lhs.shape[1] + np.count_nonzero(d)
    else:
        assert isinstance(k, int)

    a, Q = splin.eigsh(MatVecOperator(A, d), k=k)
    beta = a.max() * rcond
    keep = a > beta
    if mode == 'truncate':
        a, Q = a[keep], Q[:, keep]
    elif mode == 'clamp':
        a = np.where(keep, a, beta)
    else:
        raise RuntimeError(f"Unknown pseudoinverse mode '{mode}'.")
    return LLT((Q, a ** -0.5))
