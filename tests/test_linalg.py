"""Linear algebra helper tests (reference strategy: ``test/linalg/``)."""
import numpy as np
import pytest

from graphdot_tpu.linalg.block import binvh1
from graphdot_tpu.linalg.cg import CGSolver
from graphdot_tpu.linalg.cholesky import CholSolver, chol_solve
from graphdot_tpu.linalg import low_rank as lr
from graphdot_tpu.linalg.spectral import pinvh, powerh

np.random.seed(0)


def _spd(n, rank=None):
    A = np.random.randn(n, rank or n)
    return A @ A.T + 1e-3 * np.eye(n)


def test_chol_solver():
    A = _spd(8)
    b = np.random.randn(8)
    x = CholSolver(A) @ b
    assert np.allclose(A @ x, b, atol=1e-8)
    assert np.allclose(chol_solve(A, b), x)
    assert np.allclose(CholSolver(A).todense(), np.linalg.inv(A))


def test_cg_solver():
    A = _spd(10)
    b = np.random.randn(10)
    x = CGSolver(A, rtol=1e-10) @ b
    assert np.allclose(A @ x, b, atol=1e-6)


def test_powerh():
    A = _spd(6)
    half = powerh(A, 0.5)
    assert np.allclose(half @ half, A, atol=1e-8)
    inv = powerh(A, -1.0)
    assert np.allclose(inv, np.linalg.inv(A), atol=1e-6)
    with pytest.raises(np.linalg.LinAlgError):
        powerh(-np.eye(3), -0.5)


def test_pinvh():
    A = _spd(8, rank=5)
    Ainv, nlogdet = pinvh(A, rcond=1e-8, return_nlogdet=True)
    # pseudoinverse property on the range
    assert np.allclose(A @ Ainv @ A, A, atol=1e-5)
    assert np.isfinite(nlogdet)


def test_binvh1():
    n = 6
    B = _spd(n + 1)
    A_inv = np.linalg.inv(B[:n, :n])
    B_inv = binvh1(A_inv, B[:n, n], B[n, n])
    assert np.allclose(B_inv, np.linalg.inv(B), atol=1e-8)


def test_low_rank_algebra():
    n, k = 12, 4
    X = np.random.randn(n, k)
    L = lr.dot(X)  # LLT via SVD
    assert np.allclose(L.todense(), X @ X.T, atol=1e-8)
    assert np.allclose(L.diagonal(), np.diag(X @ X.T))
    assert L.trace() == pytest.approx(np.trace(X @ X.T))

    Y = np.random.randn(n, k)
    M = lr.dot(X, Y.T)
    S = L + M
    assert np.allclose(
        S.todense(), X @ X.T + X @ Y.T, atol=1e-8
    )
    D = L - M
    assert np.allclose(D.todense(), X @ X.T - X @ Y.T, atol=1e-8)

    a = np.random.randn(n)
    assert S.quadratic(a, a) == pytest.approx(a @ S.todense() @ a)

    P = L @ M
    assert np.allclose(
        P.todense(), (X @ X.T) @ (X @ Y.T), atol=1e-6
    )


def test_llt_pinv_logdet():
    n, k = 10, 10
    X = np.random.randn(n, k)
    L = lr.dot(X)
    assert np.allclose(
        L.pinv().todense(), np.linalg.inv(X @ X.T), atol=1e-5
    )
    assert L.logdet() == pytest.approx(
        np.linalg.slogdet(X @ X.T)[1], rel=1e-6
    )
    assert L.cond() == pytest.approx(np.linalg.cond(X @ X.T), rel=1e-4)


def test_low_rank_pinvh_regularized():
    n, k = 30, 5
    X = np.random.randn(n, k)
    A = lr.dot(X)
    d = np.full(n, 0.1)
    Ainv = lr.pinvh(A, d, k=k + 6)
    dense = np.linalg.inv(X @ X.T + np.diag(d))
    # low-rank pinvh keeps the top eigen-space; check action on range
    v = X @ np.random.randn(k)
    assert np.allclose(Ainv @ v, dense @ v, atol=1e-2)
