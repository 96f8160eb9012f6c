"""Kernel wrapper tests: Normalization, Exponentiation, Tang2019 preset,
RBFKernel, KernelOverMetric (reference strategy: ``test/kernel/``)."""
import numpy as np
import pytest

from graphdot_tpu.kernel import (
    Exponentiation, MarginalizedGraphKernel, Normalization,
    Tang2019MolecularKernel
)
from graphdot_tpu.kernel.rbf import RBFKernel
from graphdot_tpu.microkernel import (
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.testing import random_molecule_set

GRAPHS = random_molecule_set(1, 6, n_atoms_range=(5, 9))


def _mlgk(**kw):
    return MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05, **kw
    )


def test_normalization_values():
    k = Normalization(_mlgk())
    K = k(GRAPHS)
    assert np.allclose(np.diag(K), 1, atol=1e-6)
    assert np.all(K <= 1 + 1e-6)
    assert np.allclose(k.diag(GRAPHS), 1)
    # cross block consistent with full
    K2 = k(GRAPHS[:2], GRAPHS)
    assert np.allclose(K2, K[:2, :], rtol=1e-5, atol=1e-6)


def test_normalization_gradient_fd():
    k = Normalization(_mlgk())
    K, dK = k(GRAPHS, eval_gradient=True)
    eps = 1e-3
    t0 = k.theta.copy()
    for i in range(len(t0)):
        tp = t0.copy()
        tp[i] += eps
        k.theta = tp
        Kp = k(GRAPHS)
        tm = t0.copy()
        tm[i] -= eps
        k.theta = tm
        Km = k(GRAPHS)
        k.theta = t0
        fd = (Kp - Km) / (2 * eps) / np.exp(t0[i])
        assert np.allclose(dK[:, :, i], fd, rtol=0.05, atol=0.01), i


def test_exponentiation():
    base = Normalization(_mlgk())
    k = Exponentiation(base, xi=2.0)
    K = k(GRAPHS)
    assert np.allclose(K, base(GRAPHS) ** 2, rtol=1e-6)
    assert len(k.theta) == len(base.theta) + 1
    K2, dK = k(GRAPHS, eval_gradient=True)
    assert dK.shape[2] == len(k.theta)
    # FD check on xi (theta[0])
    eps = 1e-4
    t0 = k.theta.copy()
    tp = t0.copy()
    tp[0] += eps
    k.theta = tp
    Kp = k(GRAPHS)
    tm = t0.copy()
    tm[0] -= eps
    k.theta = tm
    Km = k(GRAPHS)
    k.theta = t0
    fd = (Kp - Km) / (2 * eps) / np.exp(t0[0])
    assert np.allclose(dK[:, :, 0], fd, rtol=0.02, atol=1e-4)


def test_tang2019_preset():
    k = Tang2019MolecularKernel(stopping_probability=0.05)
    K = k(GRAPHS)
    assert K.shape == (len(GRAPHS), len(GRAPHS))
    assert np.allclose(K, K.T)
    D = k.diag(GRAPHS)
    assert np.allclose(D, np.diag(K), rtol=1e-6)
    assert len(k.theta) == len(k.bounds)
    clone = k.clone_with_theta(k.theta)
    assert np.allclose(clone(GRAPHS), K, rtol=1e-6)


def test_rbf_kernel():
    k = RBFKernel('exp(-0.5 * d**2 / s**2)', 'd', s=0.7)
    X = np.random.default_rng(0).normal(size=(10, 3))
    K = k(X)
    assert np.allclose(np.diag(K), 1)
    assert np.allclose(k.diag(X), 1)
    d2 = ((X[:, None] - X[None, :]) ** 2).sum(-1)
    assert np.allclose(K, np.exp(-0.5 * d2 / 0.49))
    g = k.gradient(X)
    assert len(g) == 1
    t = k.theta
    k.theta = t  # round trip
    assert k.get_params()['s'] == pytest.approx(0.7)


def test_kernel_over_metric():
    from graphdot_tpu.kernel._kernel_over_metric import KernelOverMetric
    from graphdot_tpu.metric import MaxiMin

    metric = MaxiMin(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    )
    k = KernelOverMetric(metric, 'v * exp(-d**2 / (2 * s**2))', 'd',
                         v=1.0, s=1.0)
    K = k(GRAPHS)
    assert K.shape == (len(GRAPHS), len(GRAPHS))
    assert np.allclose(np.diag(K), 1.0, atol=1e-5)
    K2, dK = k(GRAPHS, eval_gradient=True)
    assert np.allclose(K, K2)
    assert dK.shape[2] == len(k.theta)
    assert np.all(np.isfinite(dK))
    assert np.allclose(k.diag(GRAPHS), 1.0)
    clone = k.clone_with_theta()
    assert np.allclose(clone(GRAPHS), K, rtol=1e-5)
